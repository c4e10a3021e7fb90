"""Missing-value imputation: last-observation-carried-forward (LOCF)
densification of a sparse per-entity time series.

q_timeseries_gapfill (timeseries.py) densifies a *count* series with
zeros; measurements need a different rule — a missing reading means
"unchanged since last observed", so gaps fill with the most recent
prior value per entity.  This is the standard feature-store /
point-in-time-correctness shape (sensor rollups, account balances,
slowly-sampled metrics joined to a daily grid).

Pipeline, Spark-first:

1. per (user, day) pick the LAST purchase value by the total order
   (ts, event_id) — a single-pass ``max(struct(...))`` hash aggregate
   (the argmax pattern q_agg_minmax_by established), no window over
   the fact table;
2. build the dense grid: the calendar spine is a bounded dim derived
   from a 1-row bounds aggregate (date_spine — always the broadcast
   side), crossed with the distinct-entity dim — grid size is
   |entities| x |days|, independent of event volume;
3. LOCF is ``last(value, ignorenulls=True)`` over a per-entity
   ROWS-unbounded-preceding frame — WindowExec partitions by entity,
   so state is one entity's calendar, never corpus-sized.  Days before
   an entity's first observation stay NULL (both engines agree).

The demo restricts to a deterministic 10% entity shard
(``user_id % 10 = 7``) to keep the demo grid small; the shape is
unchanged at any shard width.  The oracle restates the spine as a
recursive day-walk (gapfill precedent) and LOCF as DuckDB's
``last_value(... IGNORE NULLS)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..caching import persist_tracked
from ..io import load_table
from ..registry import register
from .timeseries import date_spine

_LOCF_ORACLE = """
    WITH RECURSIVE obs AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             (MAX({'ts': ts, 'eid': event_id, 'v': value})).v AS value_obs
      FROM events
      WHERE event_type = 'purchase' AND user_id % 10 = 7
      GROUP BY user_id, CAST(ts AS DATE)),
    bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM obs),
    walk(d) AS (
      SELECT lo FROM bounds
      UNION ALL
      SELECT CAST(d + INTERVAL 1 DAY AS DATE) FROM walk
      WHERE d < (SELECT hi FROM bounds)),
    grid AS (
      SELECT u.user_id, CAST(w.d AS DATE) AS d
      FROM (SELECT DISTINCT user_id FROM obs) u, walk w)
    SELECT g.user_id, g.d,
           o.value_obs,
           last_value(o.value_obs IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf,
           CAST(o.value_obs IS NULL AS INT) AS was_filled
    FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.d = g.d
    ORDER BY g.user_id, g.d
"""


@register("q_locf_impute", oracle=_LOCF_ORACLE, tags=("timeseries", "etl"))
def q_locf_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF imputation over the dense (entity x day) grid (see module
    docstring): single-pass argmax picks each entity-day's last
    observed purchase value, the bounded calendar spine crosses the
    entity dim into the grid, and a per-entity running ``last(...,
    ignorenulls)`` window carries values forward.  No arithmetic on
    the doubles — values are *picked*, so cross-engine exactness is
    structural."""
    ev = load_table(spark, sf_dir, "events")
    # The per-(entity, day) aggregate feeds three consumers (bounds,
    # entity dim, grid join); persisting it spares two full re-scans of
    # the fact table, and the frame is entity x observed-day sized —
    # far smaller than the raw events.
    obs = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("user_id") % 10 == 7))
        .groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(
            F.max(F.struct("ts", "event_id", "value"))["value"].alias("value_obs")
        )
    )
    obs = persist_tracked(obs)
    bounds = obs.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    users = obs.select("user_id").distinct()
    grid = users.crossJoin(F.broadcast(date_spine(bounds, "lo", "hi")))
    w = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, ["user_id", "d"], "left")
        .select(
            "user_id",
            "d",
            "value_obs",
            F.last("value_obs", ignorenulls=True).over(w).alias("value_locf"),
            F.col("value_obs").isNull().cast("int").alias("was_filled"),
        )
    )
