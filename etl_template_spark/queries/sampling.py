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


def hash_rank_key(col: Column) -> Column:
    """Un-bucketed 32-bit hash value — the deterministic 'random' sort
    key for rank-based sampling (ties broken by the key itself).
    Identical formula to the q_sample_hash contract and `_rank_sql`."""
    return F.conv(
        F.substring(F.sha2(col.cast("string"), 256), 1, 8), 16, 10
    ).cast("bigint")


def hash_bucket(col: Column, modulus: int) -> Column:
    """Deterministic bucket in [0, modulus): ``hash_rank_key`` reduced
    mod ``modulus``."""
    return hash_rank_key(col) % modulus


def _rank_sql(key: str = "doc_id") -> str:
    return (
        f"CAST(concat('0x', substr(sha256(CAST({key} AS VARCHAR)), 1, 8)) "
        f"AS BIGINT)"
    )


# per-source acceptance rate (per mille): a rule standing in for the
# mixture table a real pipeline would load (fixture sources are
# 'src<N>'); expressed identically in builder and oracle.  TRY_CAST,
# not CAST: DuckDB regexp_extract returns '' (not NULL) on no match,
# and CAST('' AS INT) throws — TRY_CAST yields NULL, matching Spark's
# cast-to-null, so a digitless source gets rate 100 in BOTH engines
# instead of crashing the oracle.
_RATE_SQL = (
    "least(1000, 100 + 45 * coalesce("
    "TRY_CAST(regexp_extract(source, '([0-9]+)$', 1) AS INT), 0))"
)


def mixture_spec(d: DataFrame) -> DataFrame:
    """(source, rate) mixture-spec frame over ``d``'s distinct sources —
    the builder-side statement of `_RATE_SQL`, shared with the worked
    example (etl_template_spark/examples/curation_pipeline.py) so the rate rule cannot
    silently diverge."""
    src_num = F.coalesce(
        F.regexp_extract(F.col("source"), r"([0-9]+)$", 1).cast("int"), F.lit(0)
    )
    return (
        d.select("source")
        .distinct()
        .select(
            "source",
            F.least(F.lit(1000), F.lit(100) + F.lit(45) * src_num)
            .cast("int")
            .alias("rate"),
        )
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
    spec = mixture_spec(d)
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


# ---------------------------------------------------------------------------
# q_sample_cluster — MinHash cluster sampling (one representative per
# near-dup cluster, cluster size as training weight)
# ---------------------------------------------------------------------------


def _cluster_sample_oracle() -> str:
    # Near-dup clusters exactly as q_dedup_cluster's oracle (recursive
    # CTE transitive closure over the verified MinHash pair graph), then
    # one representative per cluster by (n_chars DESC, doc_id) with the
    # cluster size carried as a weight; docs in no cluster are their own
    # singleton cluster.
    from .llm_text import _SHINGLES_SQL

    return """
    WITH RECURSIVE sh AS (%s),
    sizes AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id d1, b.doc_id d2, COUNT(*) c
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT d1, d2 FROM common
      JOIN sizes s1 ON s1.doc_id = d1
      JOIN sizes s2 ON s2.doc_id = d2
      WHERE c * 1.0 / (s1.n + s2.n - c) >= 0.5),
    edges AS (SELECT d1 s, d2 t FROM pairs UNION SELECT d2, d1 FROM pairs),
    reach(id, lbl) AS (
      SELECT DISTINCT s, s FROM edges
      UNION
      SELECT e.s, r.lbl FROM edges e JOIN reach r ON r.id = e.t),
    comp AS (SELECT id AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY id),
    lab AS (
      SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id, d.n_chars
      FROM documents d LEFT JOIN comp c USING (doc_id)),
    r AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY cluster_id
                                ORDER BY n_chars DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY cluster_id) AS sz
      FROM lab)
    SELECT cluster_id, doc_id AS rep_doc_id, CAST(sz AS BIGINT) AS cluster_size
    FROM r WHERE rn = 1
    ORDER BY cluster_id
    """ % _SHINGLES_SQL


@register(
    "q_sample_cluster",
    oracle=_cluster_sample_oracle(),
    tags=("llm", "dedup", "sampling"),
)
def q_sample_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash cluster sampling (SURVEY §7): collapse each near-dup
    CLUSTER to its best representative (longest text, doc_id tiebreak)
    and carry the cluster size out as a training weight — the
    dedup-aware way to downsample a crawl without losing the frequency
    signal (a page duplicated 400× is evidence, not noise; the weight
    preserves it after the copies are gone).

    Composition, not re-implementation: near-dup pairs come from the
    registered fuzzy-dedup builder (MinHash → banded LSH → verified
    Jaccard), components from operators/cluster.py's iterative
    min-label propagation (O(diameter) equi-join+agg rounds), and the
    representative pick is one WindowGroupLimit-bounded rank.  The
    oracle restates the whole chain declaratively (recursive-CTE
    closure), so engine loop and SQL fixpoint must agree exactly."""
    from ..operators.cluster import connected_components
    from .llm_text import q_dedup_fuzzy

    pairs = q_dedup_fuzzy(spark, sf_dir)
    comp = connected_components(pairs, src="d1", dst="d2")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    lab = d.join(
        comp.select(F.col("id").alias("doc_id"), "component"), "doc_id", "left"
    ).select(
        "doc_id",
        "n_chars",
        F.coalesce("component", "doc_id").alias("cluster_id"),
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    wc = Window.partitionBy("cluster_id")
    return (
        lab.withColumn("rn", F.row_number().over(w))
        .withColumn("cluster_size", F.count(F.lit(1)).over(wc))
        .where(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("rep_doc_id"),
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
        )
    )


# ---------------------------------------------------------------------------
# q_sample_budget — char-budget selection (keep best docs under a byte/
# token budget per source)
# ---------------------------------------------------------------------------

_BUDGET_FRAC = 0.6  # keep the top docs covering 60% of each source's chars


@register(
    "q_sample_budget",
    oracle=f"""
    WITH c AS (
      SELECT source, doc_id, n_chars,
             COALESCE(SUM(n_chars) OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
             SUM(n_chars) OVER (PARTITION BY source) AS total
      FROM documents)
    SELECT source, doc_id, n_chars, CAST(cum_before AS BIGINT) AS cum_before
    FROM c
    WHERE cum_before < {_BUDGET_FRAC} * total
    ORDER BY source, doc_id
    """,
    tags=("llm", "sampling", "curation"),
)
def q_sample_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted selection: per source, keep the longest documents until
    they cover {_BUDGET_FRAC:.0%} of that source's total characters —
    the 'fill the training budget with the highest-value docs first'
    shape (swap the ORDER BY for any quality score; the plan is
    unchanged).  The predicate uses the cumulative mass BEFORE each doc,
    so the first document of a source is always kept even if it alone
    exceeds the budget.

    One windowed prefix sum per source partition — sources fill in
    parallel, the serial portion is one source's metadata, and both
    window sums are CAST to BIGINT before comparison so the oracle's
    HUGEINT arithmetic canonicalizes identically (the r04 lesson,
    enforced by the type-kind guard)."""
    d = load_table(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("n_chars").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wt = Window.partitionBy("source")
    return (
        d.withColumn("cum_before", F.coalesce(F.sum("n_chars").over(w), F.lit(0)))
        .withColumn("total", F.sum("n_chars").over(wt))
        .where(F.col("cum_before") < F.lit(_BUDGET_FRAC) * F.col("total"))
        .select("source", "doc_id", "n_chars", F.col("cum_before").cast("bigint").alias("cum_before"))
    )
