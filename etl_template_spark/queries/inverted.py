"""Positional inverted-index construction — the retrieval-infrastructure
twin of q_bm25_rank (retrieval.py scores against an index; this builds
one).

The output is the index's physical layout, relational-style: one row
per (term, document) posting carrying the within-document term
frequency and the comma-joined 1-based token positions (phrase/proximity
queries need positions, not just tf), joined with the corpus-global
term statistics (document frequency, collection frequency) every
scoring function consumes.

Scale shape: one ``posexplode`` of the token list (a generator
projection, no shuffle), then two hash aggregations — per-(term, doc)
posting assembly and per-term global stats — both with map-side partial
aggregation, and a final term-keyed equi-join.  Writing the result
partitioned by a term-hash bucket IS the sharded index layout a search
cluster serves from; nothing here is driver-side.

The demo emits postings for a deterministic 10% document shard
(``doc_id % 10 = 3``) against FULL-corpus term statistics — exactly the
incremental posture of indexing one new shard of a 100 TB corpus while
df/cf come from the maintained global stats table.  Output volume
stays bounded by the shard, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.dedup import tokens_col
from ..registry import register

_INDEX_ORACLE = """
    WITH tok AS (
      SELECT doc_id, i AS pos, w[i] AS term
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           unnest(range(1, len(w) + 1)) AS u(i)),
    posting AS (
      SELECT term, doc_id,
             CAST(COUNT(*) AS BIGINT) AS tf,
             array_to_string(list(pos ORDER BY pos), ',') AS positions
      FROM tok
      WHERE doc_id % 10 = 3
      GROUP BY term, doc_id),
    stats AS (
      SELECT term,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
             CAST(COUNT(*) AS BIGINT) AS cf
      FROM tok GROUP BY term)
    SELECT p.term, p.doc_id, p.tf, p.positions, s.df, s.cf
    FROM posting p JOIN stats s ON p.term = s.term
    ORDER BY p.term, p.doc_id
"""


@register("q_index_inverted", oracle=_INDEX_ORACLE, tags=("llm", "retrieval"))
def q_index_inverted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the positional inverted index for a 10% document shard
    with full-corpus term stats (see module docstring).  Positions are
    1-based token offsets, sorted and comma-joined so the posting is a
    single comparable value; ``sort_array(collect_list(...))`` keeps the
    assembly a hash aggregate (no per-group sort shuffle) since each
    document's position list is small regardless of corpus size."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.posexplode(tokens_col()).alias("pos0", "term")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")

    posting = (
        tok.filter(F.col("doc_id") % 10 == 3)
        .groupBy("term", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("pos")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("positions"),
        )
    )
    stats = tok.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"),
        F.count(F.lit(1)).alias("cf"),
    )
    return posting.join(stats, "term").select(
        "term", "doc_id", "tf", "positions", "df", "cf"
    )
