"""q_stream_join_outer — the left-outer batch twin of the watermarked
stream-stream join (round 9, VERDICT r8 #5c).

``streaming/jobs.py::join_streams`` has supported ``how='left_outer'``
since r8 — unconverted clicks emit with null purchase columns once the
watermark proves no future purchase can still match — but only the
inner variant had a registered batch contract (q_stream_join).  This
query is the outer contract: every click appears exactly once per
matched purchase, and clicks with NO purchase within the window appear
exactly once with nulls — the "conversion funnel including the
non-converters" shape that an inner join silently drops and that outer
stream-stream joins exist to finalize.

Plan shape (same as q_stream_join): equi-join on user_id with the time
bound as a post-join band predicate on co-partitioned rows — one
shuffle per side, no crossJoin; in streaming the same bound is what
makes the null side FINALIZABLE (state evicts at watermark - within).

Reference parity: the reference has no joins at all (tools.go);
declared engine surface per SURVEY §2B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


@register(
    "q_stream_join_outer",
    oracle="""
    SELECT
      c.user_id,
      c.event_id  AS click_id,
      c.ts        AS click_ts,
      p.event_id  AS purchase_id,
      p.ts        AS purchase_ts,
      p.value     AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '2 hours'
    """,
    tags=("streaming", "join"),
)
def q_stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer purchase-attribution interval join: every click, with
    its within-2h same-user purchases or one null row if none came —
    the batch twin of ``join_streams(..., how='left_outer')``."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 2 HOURS")),
        "left_outer",
    ).select(
        "user_id", "click_id", "click_ts", "purchase_id", "purchase_ts",
        "purchase_value",
    )
