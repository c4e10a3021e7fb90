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

from pyspark.sql import DataFrame, SparkSession, Window
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

    r13 made this ONE pass instead of three (the old shape scanned
    events three times and joined the stage frames — 10 exchanges);
    r14 keeps the single pass but replaces the r13 per-user
    collect_list/array_sort timestamp ARRAYS — unbounded per-user
    aggregation state in an unspillable ObjectHashAggregate buffer,
    i.e. one bot user = one giant in-memory array (guide §5; r13
    ADVICE) — with three chained window MINs over the same single
    scan:

        t_view     = MIN(ts)                         FILTER (view)
        t_click    = MIN(ts > t_view)                FILTER (click)
        t_purchase = MIN(ts > t_click)               FILTER (purchase)

    Each window is an unbounded frame over ``user_id`` — constant
    per-group aggregation state, and the window operator's row buffer
    spills to disk, so a skewed user costs disk, never memory.  All
    three windows share one partitioning: the plan is 1 scan, 1
    exchange, 1 sort, 3 Window ops, then a final hash aggregate that
    collapses the per-event rows to one per user (it rides the same
    partitioning — no second exchange).  Equivalence to the staged
    MINs is the same argument as r13's arrays: min(ts | click AND
    ts > t_view) IS the conditioned stage-2 MIN, and a NULL t_view /
    t_click makes the comparison NULL → the filter drops the row →
    the next stage is NULL, exactly the LEFT-JOIN semantics of the
    oracle.  Rows verified identical at both SFs."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    base = ev.where(
        F.col("event_type").isin("view", "click", "purchase")
    ).select("user_id", "event_type", "ts")
    t_view = F.min(
        F.when(F.col("event_type") == "view", F.col("ts"))
    ).over(w)
    staged = base.withColumn("t_view", t_view)
    staged = staged.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") > F.col("t_view")),
                F.col("ts"),
            )
        ).over(w),
    )
    staged = staged.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t_click")),
                F.col("ts"),
            )
        ).over(w),
    )
    return (
        staged.where(F.col("t_view").isNotNull())
        .groupBy("user_id")
        .agg(
            F.min("t_view").alias("t_view"),
            F.min("t_click").alias("t_click"),
            F.min("t_purchase").alias("t_purchase"),
        )
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            F.when(F.col("t_purchase").isNotNull(), 3)
            .when(F.col("t_click").isNotNull(), 2)
            .otherwise(1)
            .alias("stage"),
        )
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
