"""Event-sequence analytics: funnel conversion and cohort retention.

The two queries every product-analytics workload runs over an event
stream, expressed as plain aggregations + joins so they stay inside
whole-stage codegen and scale as ordinary hash-partitioned work:

- Funnel (view → click → purchase, strictly ordered in time): one
  MIN-aggregate per stage, each conditioned on the previous stage's
  timestamp — never a per-user sort or a sequence UDF.  All three
  aggregates and the assembling joins hash-partition on ``user_id``,
  so after the first shuffle every later stage is co-partitioned
  (Spark reuses the exchange; at 1000 executors this is 1 wide
  shuffle + narrow joins, and AQE collapses the tiny tails).
- Retention (signup-week cohort × weeks-since-cohort): two aggregates
  over ``date_trunc('week')`` buckets — cardinality collapses from
  events to (user × week) then to (cohort-week × offset), so the final
  shuffle carries a few hundred rows no matter how many events came in.

Reference parity: none (the reference has no analytics surface) —
these extend the engine the same way the LLM operators do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


@register(
    "q_events_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id)
    SELECT
      v.user_id,
      v.t_view,
      c.t_click,
      p.t_purchase,
      CASE WHEN p.user_id IS NOT NULL THEN 3
           WHEN c.user_id IS NOT NULL THEN 2
           ELSE 1 END AS stage
    FROM v
    LEFT JOIN c ON c.user_id = v.user_id
    LEFT JOIN p ON p.user_id = v.user_id
    ORDER BY v.user_id
    """,
    tags=("events", "analytics"),
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel per user: first view, first click AFTER that
    view, first purchase AFTER that click; ``stage`` = furthest step
    reached.  Strict ordering is what makes it a funnel — a purchase
    before the click must not count, so each stage's MIN is conditioned
    on the previous stage's timestamp, not just on event type.

    r13 optimization: ONE pass instead of three.  The old shape scanned
    events three times (one filtered aggregate per stage), joined each
    stage to the previous one, and left-joined the three stage frames
    back together — 10 exchanges in the plan.  A funnel's state is
    per-user, so one groupBy(user_id) can carry everything: the view
    MIN directly, and the click/purchase candidates as sorted
    timestamp arrays from which the first element strictly after the
    previous stage's time is picked (identical to the conditioned MIN:
    the filtered ascending array's head IS min(ts WHERE ts > prev)).
    One scan, one exchange; per-user state is bounded by that user's
    events, which any per-user funnel needs.  A/B cold at sf0.1
    (identical rows at both SFs): 0.98 s → 0.35 s exec median."""
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.where(F.col("event_type").isin("view", "click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
                "t_view"
            ),
            F.array_sort(
                F.collect_list(
                    F.when(F.col("event_type") == "click", F.col("ts"))
                )
            ).alias("_clicks"),
            F.array_sort(
                F.collect_list(
                    F.when(F.col("event_type") == "purchase", F.col("ts"))
                )
            ).alias("_purchases"),
        )
        .where(F.col("t_view").isNotNull())
    )
    t_click = F.get(
        F.filter("_clicks", lambda x: x > F.col("t_view")), 0
    )
    staged = per_user.withColumn("t_click", t_click).withColumn(
        "t_purchase",
        F.get(F.filter("_purchases", lambda x: x > F.col("t_click")), 0),
    )
    return staged.select(
        "user_id",
        "t_view",
        "t_click",
        "t_purchase",
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .otherwise(1)
        .alias("stage"),
    )


@register(
    "q_events_retention",
    oracle="""
    WITH cohort AS (
      SELECT user_id,
             CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS TIMESTAMP) AS activity_week
      FROM events)
    SELECT
      c.cohort_week,
      CAST((epoch_us(a.activity_week) - epoch_us(c.cohort_week))
           / (7 * 86400 * CAST(1000000 AS BIGINT)) AS INT) AS week_offset,
      COUNT(DISTINCT c.user_id) AS n_users
    FROM cohort c JOIN activity a ON a.user_id = c.user_id
    GROUP BY 1, 2
    ORDER BY cohort_week, week_offset
    """,
    tags=("events", "analytics"),
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-activity week, counted
    in each subsequent activity week (offset 0 = the cohort week
    itself).  Shape at scale: the event stream collapses to
    (user, week) DISTINCT first, then to the tiny cohort×offset grid —
    the expensive dedup happens map-side before the final shuffle."""
    ev = load_table(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("activity_week")
    ).distinct()
    # NTZ-safe epoch: cast to session-TZ timestamp first (UTC session —
    # unix_micros is illegal on TIMESTAMP_NTZ in Spark 4)
    def _us(c):
        return F.unix_micros(c.cast("timestamp"))

    offset = (
        (_us(F.col("activity_week")) - _us(F.col("cohort_week")))
        / F.lit(7 * 86400 * 1000000)
    ).cast("int")
    return (
        cohort.join(activity, "user_id")
        .groupBy("cohort_week", offset.alias("week_offset"))
        .agg(F.count_distinct("user_id").alias("n_users"))
    )
