"""Time-series resampling (round 7): gap-filling a daily series over a
generated date spine — the densification step every downstream
time-series consumer (dashboards, forecasting features, SLO burn rates)
needs before a rolling window means what it says.

A GROUP BY date silently DROPS empty days; a 7-day rolling average over
that sparse series is wrong on every window that spans a gap.  The fix
is a date spine: generate the full calendar between the series bounds,
left-join the aggregate onto it, zero-fill, and mark which rows are
synthetic.  The spine is the new primitive here (a generator source —
``sequence`` + ``explode`` — rather than any scan); everything else is
the engine's existing aggregate/join machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import persist_tracked
from ..io import load_table
from ..registry import register


def date_spine(bounds: DataFrame, lo: str, hi: str) -> DataFrame:
    """One row per day in [lo, hi] (inclusive), from a 1-row bounds
    frame: ``sequence`` builds the array in a single generator task —
    fine for any plausible calendar (even a century is ~36.5k rows) —
    and ``explode`` flattens it.  The spine is a bounded dim no matter
    the fact-table size, so it always sits on the broadcast side."""
    return bounds.select(
        F.explode(
            F.expr(f"sequence({lo}, {hi}, interval 1 day)")
        ).alias("d")
    )


@register(
    "q_timeseries_gapfill",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders
      FROM orders GROUP BY 1),
    bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM daily),
    walk(d) AS (
      SELECT lo FROM bounds
      UNION ALL
      SELECT CAST(d + INTERVAL 1 DAY AS DATE) FROM walk
      WHERE d < (SELECT hi FROM bounds)),
    spine AS (SELECT CAST(d AS DATE) AS d FROM walk)
    SELECT spine.d,
           COALESCE(daily.n_orders, 0) AS n_orders,
           daily.n_orders IS NULL AS filled
    FROM spine LEFT JOIN daily USING (d)
    ORDER BY spine.d
    """,
    tags=("timeseries", "etl"),
)
def q_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily order counts densified over the full [min, max] calendar
    (the fixture's o_orderdate is a timestamp; both engines truncate to
    DATE before grouping):
    empty days appear with ``n_orders = 0`` and ``filled = true``, so
    downstream rolling windows see a gap-free series.

    Plan shape, and why it holds at 100 TB: the only corpus-shaped work
    is the GROUP BY date over the fact table (partial map-side combine
    into at most a few thousand date groups); the spine generates from
    the 1-row bounds aggregate — a bounded dim regardless of fact size —
    and the left join of spine against the date-grouped aggregate is a
    broadcast join between two calendar-bounded frames.  No shuffle
    scales with the data volume.

    The oracle restates the spine as a recursive CTE day-walk (DuckDB's
    ``range``/``generate_series`` table functions only accept constant
    bounds, so a data-derived spine must recurse); counts and the
    synthetic-row marker are integer/bool exact."""
    orders = load_table(spark, sf_dir, "orders")
    # daily feeds both the bounds aggregate and the spine join; the
    # persist (calendar-sized) keeps the fact scan single.
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    daily = persist_tracked(daily)
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = date_spine(bounds, "lo", "hi")
    return (
        spine.join(daily, "d", "left")
        .select(
            "d",
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
            F.col("n_orders").isNull().alias("filled"),
        )
        .orderBy("d")
    )
