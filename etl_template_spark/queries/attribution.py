"""Multi-touch attribution: linear credit assignment over event
journeys.

The events-analytics family (events_analytics.py) answers *what
happened* (funnels, retention, transitions); attribution answers *what
caused the conversion* — the revenue-allocation question every
marketing/growth pipeline ends in.  Linear attribution splits each
purchase's value equally across every touch (click / view / signup)
by the same user in the preceding 7-day window; purchases with no
in-window touch credit a synthetic ``direct`` channel, so total
attributed value always reconciles to total purchase value (the
invariant the unit test pins).

Spark-first shape:

1. purchases LEFT JOIN touches on the **user equi-key** with the time
   band as a residual join condition — Catalyst plans a hash/SMJ join
   on ``user_id``, never a pair explosion; per-user journeys bound the
   fan-out;
2. the per-purchase touch count is a window over the purchase's own
   event_id (conversion-keyed, tiny partitions), giving each pair its
   ``value / n`` share — one exact IEEE division per purchase;
3. per-channel rollup uses the decimal-exact summation pattern
   (compat.dsum) so the engine-vs-oracle — and run-vs-run at any
   parallelism — totals are bit-identical.

At 100 TB the only corpus-shaped shuffle is the user-keyed join, and
both inputs arrive already filtered by event_type at the scan
(predicate pushdown); everything after the join is keyed by
conversion or by the 4-row channel dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..compat import dsum, dsum_sql
from ..io import load_table
from ..registry import register

_WINDOW_DAYS = 7
_TOUCH_TYPES = ("click", "view", "signup")

_ATTR_ORACLE = f"""
    WITH purchases AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'),
    touches AS (
      SELECT user_id, ts, event_type FROM events
      WHERE event_type IN ('click', 'view', 'signup')),
    pairs AS (
      SELECT p.event_id, p.value, t.event_type AS channel
      FROM purchases p
      LEFT JOIN touches t
        ON t.user_id = p.user_id
       AND t.ts <= p.ts
       AND t.ts >= p.ts - INTERVAL {_WINDOW_DAYS} DAY),
    shared AS (
      SELECT COALESCE(channel, 'direct') AS channel,
             value / COUNT(*) OVER (PARTITION BY event_id) AS share
      FROM pairs)
    SELECT channel,
           COUNT(*) AS n_credits,
           {dsum_sql('share')} AS attributed_value
    FROM shared
    GROUP BY channel
    ORDER BY channel
"""


@register("q_attribution_linear", oracle=_ATTR_ORACLE, tags=("events", "attribution"))
def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution with a 7-day lookback (see module
    docstring): per channel, the number of credited (purchase, touch)
    pairs and the decimal-exact attributed revenue; touchless purchases
    credit ``direct`` in full.  Total attributed value reconciles to
    total purchase value by construction."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"), "value"
    )
    touches = ev.filter(F.col("event_type").isin(*_TOUCH_TYPES)).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("channel"),
    )
    pairs = purchases.join(
        touches,
        on=[
            F.col("t_user") == F.col("p_user"),
            F.col("t_ts") <= F.col("p_ts"),
            F.col("t_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {_WINDOW_DAYS} DAY"),
        ],
        how="left",
    )
    shared = pairs.select(
        F.coalesce(F.col("channel"), F.lit("direct")).alias("channel"),
        (
            F.col("value") / F.count(F.lit(1)).over(Window.partitionBy("event_id"))
        ).alias("share"),
    )
    return shared.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_credits"),
        dsum("share").alias("attributed_value"),
    )
