"""Point-in-time (PIT) temporal lookup against an SCD2 dimension.

Completes the temporal-join triad: ``q_join_asof`` (nearest prior
event), ``q_scd2`` (building validity intervals), and now the lookup
that consumes them — "which dimension version was valid when this fact
happened?".  This is the feature-store / reproducible-training
correctness primitive: joining a fact to the *current* dimension row
leaks future attribute values into historical records (training-serving
skew); the PIT join pins each fact to the version valid at its own
timestamp.

Facts here are purchase events; the dimension is the signup-derived
SCD2 table q_scd2 builds (reused directly — one definition, two
queries).  Match rule: ``valid_from <= fact.ts < valid_to`` with an
open-ended current interval; facts before a user's first version (or
for users with no version) keep a NULL segment through a LEFT join —
dropped facts would silently bias any downstream aggregate.

Scale shape: the join is an **equi-join on the entity key** with the
interval containment as a residual predicate — per-key version chains
are short (bounded by update frequency, not corpus size), so the
residual scan after the hash/SMJ match is tiny.  Because SCD2
intervals per key are non-overlapping by construction, each fact
matches at most one version — the join cannot fan out.  The naive
alternative (global range join on time) shuffles on a non-key and
explodes; keying by entity is what makes PIT lookups linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register
from .etl_ops import q_scd2

_PIT_ORACLE = """
    WITH dim AS (
      SELECT user_id,
             value AS segment_value,
             ts    AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to
      FROM events WHERE event_type = 'signup'),
    facts AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase')
    SELECT f.event_id, f.user_id, f.ts, f.value,
           d.segment_value,
           d.valid_from AS segment_since,
           CAST(d.user_id IS NULL AS INT) AS unmatched
    FROM facts f
    LEFT JOIN dim d
      ON d.user_id = f.user_id
     AND d.valid_from <= f.ts
     AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    ORDER BY f.event_id
"""


@register("q_scd2_lookup", oracle=_PIT_ORACLE, tags=("etl", "temporal"))
def q_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup of each purchase's user segment from the
    SCD2 dimension (see module docstring): entity-keyed equi-join with
    interval containment as the residual predicate; at most one match
    per fact by interval construction; unmatched facts survive with a
    NULL segment and an ``unmatched`` audit flag."""
    ev = load_table(spark, sf_dir, "events")
    dim = q_scd2(spark, sf_dir).select(
        F.col("user_id").alias("d_user"),
        "segment_value",
        "valid_from",
        "valid_to",
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = facts.join(
        dim,
        on=[
            F.col("d_user") == F.col("user_id"),
            F.col("valid_from") <= F.col("ts"),
            F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to")),
        ],
        how="left",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        "segment_value",
        F.col("valid_from").alias("segment_since"),
        F.col("d_user").isNull().cast("int").alias("unmatched"),
    )
