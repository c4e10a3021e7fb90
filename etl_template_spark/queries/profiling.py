"""Data profiling / quality monitoring (round 7): the two report
shapes a data platform runs over every landed dataset — a per-column
profile (nulls, cardinality) and a per-source distribution-drift score
against the corpus baseline.

Profiling is the operator class that answers "can I trust this
refresh?" before anything joins it; drift is the LLM-mixture
counterpart ("did src7's language mix shift under me?") that catches
upstream crawler changes before they move the training mixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import persist_tracked
from ..compat import dsum, dsum_sql
from ..io import load_table
from ..registry import register

_PROFILE_TABLE = "customer"
_PROFILE_COLS = (
    "c_custkey",
    "c_name",
    "c_nationkey",
    "c_acctbal",
    "c_mktsegment",
)


def profile_frame(d: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """(col_name, n_null, n_distinct) per column, in ONE aggregation
    over ONE scan: all the null counters and distinct counters evaluate
    in the same Aggregate (Spark plans the multi-distinct via Expand —
    input rows replicate per distinct column, but it stays a single
    shuffle with partial combines), then the 1-row result melts to one
    row per column driver-free via posexplode of a literal struct
    array.

    At true 100 TB profile scale the exact distinct counters swap for
    ``approx_count_distinct`` (HLL — the engine's q_agg_approx proves
    that machinery) and the Expand disappears; the exact form here is
    what a SQL oracle can certify."""
    aggs = []
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}")
        )
        aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}"))
    one = d.agg(*aggs)
    melted = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"__nn_{c}").alias("n_null"),
                F.col(f"__nd_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return (
        one.select(F.explode(melted).alias("p"))
        .select("p.col_name", "p.n_null", "p.n_distinct")
        .orderBy("col_name")
    )


def _profile_oracle() -> str:
    parts = [
        f"SELECT '{c}' AS col_name, "
        f"COUNT(*) FILTER (WHERE {c} IS NULL) AS n_null, "
        f"COUNT(DISTINCT {c}) AS n_distinct FROM {_PROFILE_TABLE}"
        for c in _PROFILE_COLS
    ]
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


@register(
    "q_profile_table",
    oracle=_profile_oracle(),
    tags=("profiling", "quality", "etl"),
)
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of the customer table: null count and exact
    distinct cardinality for every column, as one (col_name, n_null,
    n_distinct) row each — the landing report that catches a broken
    upstream export (suddenly-null column, collapsed cardinality)
    before anything consumes the refresh.

    Plan shape: ONE scan, ONE aggregation (see ``profile_frame``); the
    melt from the 1-row aggregate to per-column rows is a literal-array
    explode, not a driver loop.  The oracle is the same report as a
    UNION ALL of per-column aggregates — integer-exact on both
    engines."""
    return profile_frame(
        load_table(spark, sf_dir, _PROFILE_TABLE), _PROFILE_COLS
    )


# ---------------------------------------------------------------------------
# q_distribution_drift — per-source language-mix drift vs the corpus
# ---------------------------------------------------------------------------


@register(
    "q_distribution_drift",
    oracle=f"""
    WITH sl AS (
      SELECT source, lang, COUNT(*) AS n_sl
      FROM documents WHERE lang IS NOT NULL
      GROUP BY 1, 2),
    s AS (SELECT source, SUM(n_sl) AS n_s FROM sl GROUP BY 1),
    l AS (SELECT lang, SUM(n_sl) AS n_l FROM sl GROUP BY 1),
    t AS (SELECT SUM(n_sl) AS n_tot FROM sl),
    terms AS (
      SELECT sl.source,
             round((CAST(n_sl AS DOUBLE) / n_s) *
                   ln((CAST(n_sl AS DOUBLE) / n_s) /
                      (CAST(n_l AS DOUBLE) / n_tot)), 6) AS term
      FROM sl JOIN s USING (source) JOIN l USING (lang) CROSS JOIN t)
    SELECT source,
           {dsum_sql('term')} AS kl,
           CAST(COUNT(*) AS INT) AS n_langs
    FROM terms
    GROUP BY source
    ORDER BY source
    """,
    tags=("profiling", "llm", "quality"),
)
def q_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix drift per source: KL(P_source || P_corpus) over the
    language distribution, the monitoring score that flags a source
    whose content mix shifted away from the corpus baseline (crawler
    regression, upstream re-crawl, injected spam) — rising KL on one
    source is the earliest visible symptom.

    Only languages the source actually emits contribute terms (P > 0),
    so the sum is well-defined without smoothing; NULL-lang rows are
    excluded up front in BOTH engines (a NULL would silently drop at
    the lang join and skew P totals).

    Plan shape, and why it holds at 100 TB: one partial-combining
    aggregate over (source, lang) — thousands of groups at most — then
    every join (per-source totals, per-lang totals, the 1-row corpus
    total) is between group-sized frames; nothing corpus-shaped
    shuffles after the first aggregate.  Per-term arithmetic is
    deterministic per-row IEEE (explicit double casts, ln, round 6);
    the per-source sum is decimal-exact (compat.dsum), so the oracle
    reproduces every score bit-for-bit."""
    d = load_table(spark, sf_dir, "documents").where(F.col("lang").isNotNull())
    # The (source, lang) count table feeds four consumers (per-source
    # totals, per-lang totals, the corpus total, and the term join);
    # persisting this group-sized frame keeps the corpus scan single.
    sl = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n_sl"))
    sl = persist_tracked(sl)
    s = sl.groupBy("source").agg(F.sum("n_sl").alias("n_s"))
    lg = sl.groupBy("lang").agg(F.sum("n_sl").alias("n_l"))
    tot = sl.agg(F.sum("n_sl").alias("n_tot"))
    p = F.col("n_sl").cast("double") / F.col("n_s")
    q = F.col("n_l").cast("double") / F.col("n_tot")
    term = F.round(p * F.log(p / q), 6)
    return (
        sl.join(s, "source")
        .join(F.broadcast(lg), "lang")
        .crossJoin(F.broadcast(tot))
        .select("source", term.alias("term"))
        .groupBy("source")
        .agg(
            dsum("term").alias("kl"),
            F.count(F.lit(1)).cast("int").alias("n_langs"),
        )
        .orderBy("source")
    )
