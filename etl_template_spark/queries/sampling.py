"""Deterministic sampling family (SURVEY.md §7 phase-7): the
training-mixture construction operators — weighted source mixing,
exact-allocation stratified sampling, and fixed-size corpus sampling.

One shared discipline (established by q_sample_hash, etl_ops.py): the
sampling decision is a pure function of row CONTENT — a sha2-derived
bucket/rank of the stable key — never ``rand()``/``df.sample()``.  The
same row is kept on every engine, every task retry, and every cluster
size; samples compose with incremental ingest (re-running over an
appended corpus keeps the identical prior rows and only decides the new
ones); and every operator stays SQL-expressible, so the DuckDB oracle
hash-checks the exact row set.

Scale shapes: the weighted mixture is a broadcast-dim join over a pure
projection (no shuffle of the corpus); the stratified sample is one
window per stratum under WindowGroupLimit (bounded per-group state);
the fixed-size sample is a global top-k (TakeOrderedAndProject:
per-partition heaps + driver merge — the distributed equivalent of
merging per-partition reservoirs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

_MIX_BUCKETS = 1000  # per-mille acceptance rates for the weighted mixture
_STRAT_K = 5         # docs kept per (source, lang) stratum
_RESERVOIR_K = 100   # fixed-size corpus sample


def hash_bucket(col: Column, modulus: int) -> Column:
    """Deterministic bucket in [0, modulus): first 8 hex digits of
    sha2(key) as a 32-bit int, mod ``modulus`` — identical formula to
    the q_sample_hash contract and to `_bucket_sql` below."""
    return (
        F.conv(F.substring(F.sha2(col.cast("string"), 256), 1, 8), 16, 10)
        .cast("bigint")
        % modulus
    )


def hash_rank_key(col: Column) -> Column:
    """Un-bucketed 32-bit hash value — the deterministic 'random' sort
    key for rank-based sampling (ties broken by the key itself)."""
    return F.conv(
        F.substring(F.sha2(col.cast("string"), 256), 1, 8), 16, 10
    ).cast("bigint")


def _rank_sql(key: str = "doc_id") -> str:
    return (
        f"CAST(concat('0x', substr(sha256(CAST({key} AS VARCHAR)), 1, 8)) "
        f"AS BIGINT)"
    )


# per-source acceptance rate (per mille): a rule standing in for the
# mixture table a real pipeline would load (fixture sources are
# 'src<N>'); expressed identically in builder and oracle.
_RATE_SQL = (
    "least(1000, 100 + 45 * coalesce("
    "CAST(regexp_extract(source, '([0-9]+)$', 1) AS INT), 0))"
)


@register(
    "q_sample_weighted",
    oracle=f"""
    WITH spec AS (
      SELECT DISTINCT source, {_RATE_SQL} AS rate FROM documents),
    b AS (
      SELECT doc_id, source, lang,
             {_rank_sql()} % {_MIX_BUCKETS} AS bucket
      FROM documents)
    SELECT b.doc_id, b.source, b.lang,
           CAST(spec.rate AS INT) AS rate,
           CAST(b.bucket AS INT) AS bucket
    FROM b JOIN spec USING (source)
    WHERE b.bucket < spec.rate
    ORDER BY b.doc_id
    """,
    tags=("etl", "llm", "sampling"),
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mixture sampling: each SOURCE gets its own acceptance
    rate (per mille) — the knob that turns a raw crawl into a training
    mixture (upweight books, downweight boilerplate web).  The mixture
    spec is a tiny per-source dim frame broadcast onto the corpus scan;
    acceptance is `hash_bucket(doc_id) < rate`, so the kept set is
    deterministic per row and REFINABLE: lowering a source's rate keeps
    a strict subset of the previous sample (bucket predicates nest).

    Plan shape: scan → broadcast-hash-join (tiny spec) → filter; the
    corpus never shuffles.  At 100 TB the spec is the only state, and
    the filter pushes to the scan within each source partition."""
    d = load_table(spark, sf_dir, "documents")
    src_num = F.coalesce(
        F.regexp_extract(F.col("source"), r"([0-9]+)$", 1).cast("int"), F.lit(0)
    )
    spec = (
        d.select("source")
        .distinct()
        .select(
            "source",
            F.least(F.lit(1000), F.lit(100) + F.lit(45) * src_num)
            .cast("int")
            .alias("rate"),
        )
    )
    bucket = hash_bucket(F.col("doc_id"), _MIX_BUCKETS).cast("int")
    return (
        d.select("doc_id", "source", "lang", bucket.alias("bucket"))
        .join(F.broadcast(spec), "source")
        .where(F.col("bucket") < F.col("rate"))
        .select("doc_id", "source", "lang", "rate", "bucket")
    )


@register(
    "q_sample_stratified",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, source, lang, {_rank_sql()} AS rank_key
      FROM documents),
    r AS (
      SELECT doc_id, source, lang,
             ROW_NUMBER() OVER (PARTITION BY source, lang
                                ORDER BY rank_key, doc_id) AS rnk
      FROM b)
    SELECT doc_id, source, lang, CAST(rnk AS INT) AS rnk
    FROM r WHERE rnk <= {_STRAT_K}
    ORDER BY source, lang, rnk
    """,
    tags=("etl", "llm", "sampling"),
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-allocation stratified sampling: exactly min(k, |stratum|)
    documents from every (source, lang) stratum — the evaluation-set /
    per-domain-audit shape where proportional sampling would starve
    small strata.  Selection is rank-by-hash within the stratum, so
    membership is deterministic and stable under corpus growth ONLY
    when the stratum doesn't change — the honest semantics of exact
    allocation (contrast q_sample_weighted, whose per-row predicate
    composes with appends).

    Plan shape: one shuffle on the stratum key, then row_number under
    WindowGroupLimit — per-group state stays at k rows regardless of
    stratum size, the same bounded-memory guarantee as q_topk_per_group."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source", "lang").orderBy("rank_key", "doc_id")
    return (
        d.select(
            "doc_id", "source", "lang",
            hash_rank_key(F.col("doc_id")).alias("rank_key"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _STRAT_K)
        .select("doc_id", "source", "lang", "rnk")
    )


@register(
    "q_sample_reservoir",
    oracle=f"""
    SELECT doc_id, source, lang, {_rank_sql()} AS rank_key
    FROM documents
    ORDER BY rank_key, doc_id
    LIMIT {_RESERVOIR_K}
    """,
    tags=("etl", "llm", "sampling"),
)
def q_sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size uniform corpus sample (k=100) without replacement:
    the k rows with the smallest content-hash rank — a deterministic
    reservoir sample (hash-as-randomness makes 'uniform over the
    corpus' reproducible across engines and retries, where classic
    reservoir sampling is order- and seed-dependent).

    Plan shape: TakeOrderedAndProject — each partition keeps a k-heap
    and the driver merges heaps, which IS distributed reservoir
    merging; no global sort, no full shuffle, O(k) driver memory at
    any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id", "source", "lang",
            hash_rank_key(F.col("doc_id")).alias("rank_key"),
        )
        .orderBy("rank_key", "doc_id")
        .limit(_RESERVOIR_K)
    )
