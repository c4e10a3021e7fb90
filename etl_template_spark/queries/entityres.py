"""Entity resolution: blocked fuzzy record linkage.

A capability class the inventory lacked: matching *dirty* records back
to a clean master table when no shared key exists — the data-integration
step that precedes every customer-360 / dedup-across-systems pipeline
(and, in training-data terms, linking crawl metadata variants to a
canonical source registry).

The classic architecture, expressed Spark-first:

1. derive a deterministic *blocking key* cheap enough to compute on both
   sides (here: nation + the name's last 3 characters — perturbations
   never touch the suffix, so recall is 100% by construction);
2. candidate generation is an EQUI-join on the block key — never an
   all-pairs similarity scan.  Block sizes are bounded by key design,
   so the join is shuffle-hash work that scales linearly;
3. verify candidates with an edit-distance predicate (``levenshtein``
   is JVM-side in Spark and built-in in DuckDB — no UDF);
4. resolve to the best match per dirty record with a deterministic
   (distance ASC, key ASC) ``row_number`` window — the same rank-prune
   shape as q_topk_per_group, partitioned by dirty id so the window
   state is per-record tiny.

The fixture has no dirty twin table, so the query *derives* one
deterministically from ``customer`` (four perturbation classes keyed by
``c_custkey % 4``: exact copy, lowercased initial, dropped '#',
doubled consonant — each ≤1 edit), then links it back and scores
itself: ``is_correct`` marks whether the top match recovered the source
row.  Same-suffix neighbours (…001 vs …1001) are genuine distance-≤2
confusables, which is precisely what the best-match resolution step is
for."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

_DIRTY_SQL = """
      SELECT c_custkey + 1000000 AS dirty_id,
             c_custkey AS src_key,
             c_nationkey,
             CASE c_custkey % 4
               WHEN 1 THEN 'c' || substr(c_name, 2)
               WHEN 2 THEN replace(c_name, '#', '')
               WHEN 3 THEN replace(c_name, 'Customer', 'Custommer')
               ELSE c_name
             END AS dirty_name
      FROM customer
"""

_ER_ORACLE = f"""
    WITH dirty AS ({_DIRTY_SQL}),
    cand AS (
      SELECT d.dirty_id, d.src_key, d.dirty_name,
             c.c_custkey, c.c_name,
             levenshtein(d.dirty_name, c.c_name) AS lev
      FROM dirty d
      JOIN customer c
        ON d.c_nationkey = c.c_nationkey
       AND substr(d.dirty_name, length(d.dirty_name) - 2) =
           substr(c.c_name, length(c.c_name) - 2)
      WHERE levenshtein(d.dirty_name, c.c_name) <= 2),
    best AS (
      SELECT dirty_id, src_key, dirty_name, c_custkey, c_name, lev,
             row_number() OVER (PARTITION BY dirty_id
                                ORDER BY lev, c_custkey) AS rn
      FROM cand)
    SELECT dirty_id, dirty_name,
           c_custkey AS matched_key,
           c_name AS matched_name,
           lev,
           CAST(c_custkey = src_key AS INT) AS is_correct
    FROM best WHERE rn = 1
    ORDER BY dirty_id
"""


@register("q_entity_resolution", oracle=_ER_ORACLE, tags=("etl", "linkage"))
def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy record linkage (see module docstring): derive a
    deterministic dirty twin of ``customer``, block on
    (nation, name-suffix-3), verify with ``levenshtein <= 2``, resolve
    best-match-per-record with a (distance, key) window, and score
    recovery.  The block equi-join is the scale story: candidate pairs
    are bounded per block key, never all-pairs."""
    c = load_table(spark, sf_dir, "customer")
    dirty = c.select(
        (F.col("c_custkey") + 1000000).alias("dirty_id"),
        F.col("c_custkey").alias("src_key"),
        F.col("c_nationkey").alias("d_nationkey"),
        F.when(F.col("c_custkey") % 4 == 1,
               F.concat(F.lit("c"), F.expr("substr(c_name, 2)")))
        .when(F.col("c_custkey") % 4 == 2, F.regexp_replace("c_name", "#", ""))
        .when(F.col("c_custkey") % 4 == 3,
              F.regexp_replace("c_name", "Customer", "Custommer"))
        .otherwise(F.col("c_name"))
        .alias("dirty_name"),
    )
    suffix = lambda col: F.expr(f"substr({col}, length({col}) - 2)")  # noqa: E731
    lev = F.levenshtein("dirty_name", "c_name")
    cand = (
        dirty.join(
            c.select("c_custkey", "c_name", "c_nationkey"),
            on=[
                F.col("d_nationkey") == F.col("c_nationkey"),
                suffix("dirty_name") == suffix("c_name"),
            ],
        )
        .filter(lev <= 2)
        .select("dirty_id", "src_key", "dirty_name", "c_custkey", "c_name",
                lev.alias("lev"))
    )
    best = cand.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("dirty_id").orderBy("lev", "c_custkey")
        ),
    ).filter(F.col("rn") == 1)
    return best.select(
        "dirty_id",
        "dirty_name",
        F.col("c_custkey").alias("matched_key"),
        F.col("c_name").alias("matched_name"),
        "lev",
        (F.col("c_custkey") == F.col("src_key")).cast("int").alias("is_correct"),
    )
