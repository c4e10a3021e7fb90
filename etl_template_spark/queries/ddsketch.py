"""q_quantile_sketch — deterministic mergeable quantile sketch (round
8): DDSketch-shaped relative-error quantiles from decimal leading-digit
bins, bit-identical across engines, partitionings, and merge orders.

The mergeable-sketch class needed a quantile member (the r8 SURVEY note
after q_agg_hll), and the standard candidates all fail the engine's
determinism bar: KLL/t-digest are merge-order-dependent, and a
log-gamma DDSketch (Masson et al., VLDB 2019) puts bin boundaries at
``ceil(ln(x)/ln(γ))`` — one ulp of libm divergence between engines
flips a boundary value into the neighboring bin and breaks the hash.
This operator keeps DDSketch's CONTRACT (bounded RELATIVE error, bin
counts merge by sum) but derives the bin from the value's DECIMAL
rendering, which is integer-exact in both engines:

    v   = price in cents (the fixture is cent-exact; asserted)
    d   = digit count of v          (string length — exact)
    p2  = first two digits of v     (substring — exact)
    bin = (d, p2); covers [p2·10^(d-2), (p2+1)·10^(d-2))

Relative half-width of a bin is ``0.5/p2`` ≤ 5% (p2 ∈ [10, 99]) — the
same ~γ≈1.05 accuracy band a log DDSketch gives, with zero float ops
anywhere in the binning.  The sketch is a (group, d, p2, cnt) table:
counts merge by SUM across shards/days/snapshots exactly like
q_agg_hll's registers, and ≤ 90 bins per decade bounds the state no
matter the data volume.

Quantile extraction is rank selection over the cumulative bin counts
(window cumsum over ≤ a few hundred bins per group — bounded), with
``rank = ceil(q·n)`` (the classic lower-quantile definition); the
estimate is the selected bin's midpoint and every answer row carries
its own certified ``rel_err_bound = 0.5/p2`` — self-certifying like
q_agg_approx, but deterministic.

Scale shape: ONE hash aggregate over the fact table with map-side
combine into the bounded bin space (the only corpus-scaled work), then
windows over bin-sized frames.  At 100 TB the sketch table is what you
persist per partition/day; this query demonstrates build + merge-free
read in one plan, and the unit test proves shard-merge associativity.

Reference parity: the reference has no aggregation surface at all
(tools.go); declared engine surface per SURVEY §2B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

_QS = (0.5, 0.9, 0.99)


def sketch_bins(
    df: DataFrame, group: str | list[str], cents: F.Column
) -> DataFrame:
    """(group..., d, p2, cnt) decimal leading-digit sketch — the
    mergeable artifact (counts sum across shards).  ``cents`` must be an
    exact integer column ≥ 10 (a 1-digit value has no two-digit p2, so
    its bin range and error bound would be silently wrong, and 0 would
    null-divide the bound).  The domain floor is ENFORCED (r8 ADVICE):
    an out-of-domain value raises at scan time instead of producing a
    wrong sketch.  ``group`` may be one column name or several (the
    rollup query shards by (group, day))."""
    groups = [group] if isinstance(group, str) else list(group)
    guarded = F.when(cents >= 10, cents).otherwise(
        F.raise_error(
            F.concat(
                F.lit("sketch_bins: out-of-domain value "),
                cents.cast("string"),
                F.lit(" cents (< 10): no two-digit p2 exists for it"),
            )
        )
    )
    vs = guarded.cast("string")
    return (
        df.select(
            *[F.col(g) for g in groups],
            F.length(vs).alias("d"),
            F.substring(vs, 1, 2).cast("long").alias("p2"),
        )
        .groupBy(*groups, "d", "p2")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def sketch_quantiles(bins: DataFrame, group: str | list[str], qs=_QS) -> DataFrame:
    """Rank-select quantile estimates from a (group..., d, p2, cnt)
    sketch: one row per (group..., q) with the bin-midpoint estimate in
    dollars and the bin's certified relative-error bound."""
    groups = [group] if isinstance(group, str) else list(group)
    spark = bins.sparkSession
    w_cum = Window.partitionBy(*groups).orderBy("d", "p2")
    w_grp = Window.partitionBy(*groups)
    cum = bins.select(
        *groups,
        "d",
        "p2",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_grp).alias("n_rows"),
    )
    targets = spark.createDataFrame([(q,) for q in qs], "q double")
    rank = F.ceil(F.col("q") * F.col("n_rows")).cast("long")
    low = (F.col("p2") * F.pow(F.lit(10), F.col("d") - 2).cast("long")).alias("low")
    cand = (
        cum.crossJoin(F.broadcast(targets))
        .where(F.col("cum") >= rank)
        .select(*groups, "q", "d", "p2", "cum", "n_rows", low)
    )
    w_pick = Window.partitionBy(*groups, "q").orderBy("d", "p2")
    est = (
        (F.col("low") + (F.col("low") + F.pow(F.lit(10), F.col("d") - 2).cast("long")))
        .cast("double")
        / F.lit(2.0)
        / F.lit(100.0)
    )
    return (
        cand.withColumn("rn", F.row_number().over(w_pick))
        .where(F.col("rn") == 1)
        .select(
            *groups,
            "q",
            F.round(est, 6).alias("est"),
            F.round(F.lit(0.5) / F.col("p2"), 6).alias("rel_err_bound"),
            "n_rows",
        )
    )


@register(
    "q_quantile_sketch",
    oracle="""
    WITH cents AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS v
      FROM lineitem),
    bins AS (
      SELECT l_returnflag,
             length(CAST(v AS VARCHAR)) AS d,
             CAST(substr(CAST(v AS VARCHAR), 1, 2) AS BIGINT) AS p2,
             COUNT(*) AS cnt
      FROM cents GROUP BY 1, 2, 3),
    cum AS (
      SELECT l_returnflag, d, p2,
             SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY d, p2) AS cum,
             SUM(cnt) OVER (PARTITION BY l_returnflag) AS n_rows
      FROM bins),
    targets(q) AS (VALUES (0.5), (0.9), (0.99)),
    cand AS (
      SELECT c.l_returnflag, t.q, c.d, c.p2, c.n_rows,
             c.p2 * CAST(power(10, c.d - 2) AS BIGINT) AS low,
             CAST(power(10, c.d - 2) AS BIGINT) AS width
      FROM cum c CROSS JOIN targets t
      WHERE c.cum >= CAST(ceil(CAST(t.q AS DOUBLE) * c.n_rows) AS BIGINT)),
    picked AS (
      SELECT l_returnflag, q, d, p2, n_rows, low, width,
             row_number() OVER (PARTITION BY l_returnflag, q ORDER BY d, p2)
               AS rn
      FROM cand)
    SELECT l_returnflag,
           CAST(q AS DOUBLE) AS q,
           round(CAST(low + (low + width) AS DOUBLE) / 2.0 / 100.0, 6) AS est,
           round(0.5::DOUBLE / p2, 6) AS rel_err_bound,
           CAST(n_rows AS BIGINT) AS n_rows
    FROM picked WHERE rn = 1
    """,
    tags=("sketch", "agg"),
)
def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of l_extendedprice per return flag from the decimal
    leading-digit sketch — one bounded-state hash aggregate over the
    fact table, every estimate carrying its certified relative-error
    bound (≤ 5%, typically ≤ 1%)."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    bins = sketch_bins(li, "l_returnflag", cents)
    return sketch_quantiles(bins, "l_returnflag")


@register(
    "q_quantile_rollup",
    oracle="""
    WITH cents AS (
      SELECT l_returnflag,
             strftime(l_shipdate, '%Y-%m') AS ship_month,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS v
      FROM lineitem),
    bins AS (
      SELECT l_returnflag, ship_month,
             length(CAST(v AS VARCHAR)) AS d,
             CAST(substr(CAST(v AS VARCHAR), 1, 2) AS BIGINT) AS p2,
             COUNT(*) AS cnt
      FROM cents GROUP BY 1, 2, 3, 4),
    cum AS (
      SELECT l_returnflag, ship_month, d, p2,
             SUM(cnt) OVER (PARTITION BY l_returnflag, ship_month
                            ORDER BY d, p2) AS cum,
             SUM(cnt) OVER (PARTITION BY l_returnflag, ship_month) AS n_rows
      FROM bins),
    targets(q) AS (VALUES (0.5), (0.9), (0.99)),
    cand AS (
      SELECT c.l_returnflag, c.ship_month, t.q, c.d, c.p2, c.n_rows,
             c.p2 * CAST(power(10, c.d - 2) AS BIGINT) AS low,
             CAST(power(10, c.d - 2) AS BIGINT) AS width
      FROM cum c CROSS JOIN targets t
      WHERE c.cum >= CAST(ceil(CAST(t.q AS DOUBLE) * c.n_rows) AS BIGINT)),
    picked AS (
      SELECT l_returnflag, ship_month, q, d, p2, n_rows, low, width,
             row_number() OVER (PARTITION BY l_returnflag, ship_month, q
                                ORDER BY d, p2) AS rn
      FROM cand)
    SELECT l_returnflag, ship_month,
           CAST(q AS DOUBLE) AS q,
           round(CAST(low + (low + width) AS DOUBLE) / 2.0 / 100.0, 6) AS est,
           round(0.5::DOUBLE / p2, 6) AS rel_err_bound,
           CAST(n_rows AS BIGINT) AS n_rows
    FROM picked WHERE rn = 1
    """,
    tags=("sketch", "agg", "rollup"),
)
def q_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped mergeable-sketch UNION rollup (round 9, VERDICT r8 #5a):
    per-(flag, DAY) decimal-bin sketches merged by plain ``SUM(cnt)``
    into per-(flag, MONTH) sketches, then rank-selected into monthly
    p50/p90/p99 — per-month quantiles WITHOUT rescanning the fact
    table, the q_agg_sketch_rollup pattern applied to the quantile
    sketch.

    The differential itself proves merge associativity cross-engine:
    Spark builds DAILY sketches and merges them upward; the DuckDB
    oracle builds the MONTHLY sketch directly from rows.  The two
    agree bit-for-bit only because bin counts merge by sum exactly
    (no float ops anywhere in the binning — SURVEY §2B sketch class).

    Scale shape: at 100 TB you persist the daily (group, d, p2, cnt)
    tables once at ingest (bounded: ≤ 90 bins/decade/group/day) and
    answer any coarser-grain quantile question from sketches alone —
    the merge is a hash aggregate over sketch rows, never over data
    rows.  Reference parity: no aggregation surface in the reference
    (tools.go); declared engine surface per SURVEY §2B."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
        F.to_date("l_shipdate").alias("ship_day"),
        "l_extendedprice",
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    daily = sketch_bins(li, ["l_returnflag", "ship_month", "ship_day"], cents)
    monthly = daily.groupBy("l_returnflag", "ship_month", "d", "p2").agg(
        F.sum("cnt").alias("cnt")
    )
    return sketch_quantiles(monthly, ["l_returnflag", "ship_month"])
