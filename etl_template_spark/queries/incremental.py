"""Incremental aggregate maintenance (round 7): advance a per-key
aggregate STATE table with a delta-only aggregation and a key-join
merge — never re-scanning history.

This is the aggregation-granularity instance of the engine's
incremental family (q_dedup_incremental advances a dedup index,
q_changelog_apply advances a materialized version): at 100 TB the
history is petabytes but the daily delta is bounded, so the only
scan-shaped work an incremental refresh may do is over the DELTA.  The
state table is keys-sized; written bucketed on the key (bucketing.py)
the merge join is exchange-free.

Determinism discipline: the state keeps its running sum in EXACT
DECIMAL (compat.dec's decimal(30,6)), not double.  Decimal addition is
associative, so merging partial states in any order — or any number of
increments — lands on bit-identical totals, and equals the from-scratch
decimal aggregate the oracle computes.  A double-typed state would
accumulate order-dependent rounding and drift from the recompute, which
is precisely the bug class that makes naive incremental pipelines
unauditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..compat import _PRECISION, dec, dsum_sql
from ..io import load_table
from ..registry import register

# history/delta membership rule, stated once and mirrored in SQL: the
# already-aggregated history holds orderkeys % 3 != 0; the new arrivals
# are % 3 == 0 (a ~1/3 delta — oversized vs a real refresh, which only
# strengthens the merge test)
_BASE_PRED = "o_orderkey % 3 != 0"
_DELTA_PRED = "o_orderkey % 3 = 0"


def agg_state(d: DataFrame, key: str, value: str) -> DataFrame:
    """(key, n, total_dec): the mergeable per-key aggregate state —
    count plus an exact-decimal running sum of ``value``."""
    return d.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(value)).alias("total_dec"),
    )


def merge_agg_state(state: DataFrame, delta: DataFrame, key: str) -> DataFrame:
    """Merge two ``agg_state`` frames: full-outer key join, counts add,
    decimal sums add exactly.  Associative and order-independent — the
    algebra that lets increments apply in any grouping at any
    parallelism and still equal the from-scratch aggregate."""
    zero = F.lit(0).cast(f"decimal({_PRECISION},6)")
    j = state.alias("a").join(
        delta.alias("b"), F.col(f"a.{key}") == F.col(f"b.{key}"), "full_outer"
    )
    return j.select(
        F.coalesce(F.col(f"a.{key}"), F.col(f"b.{key}")).alias(key),
        (
            F.coalesce(F.col("a.n"), F.lit(0)) + F.coalesce(F.col("b.n"), F.lit(0))
        ).alias("n"),
        (
            F.coalesce(F.col("a.total_dec"), zero)
            + F.coalesce(F.col("b.total_dec"), zero)
        ).alias("total_dec"),
    )


@register(
    "q_incremental_agg",
    oracle=f"""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           {dsum_sql('o_totalprice')} AS total
    FROM orders
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
    tags=("etl", "incremental", "agg"),
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a per-customer order aggregate:
    the maintained state (count + exact-decimal sum over the history
    partition) is advanced by aggregating ONLY the delta partition and
    merging on the key — and the result must equal the from-scratch
    aggregate over the full table, which is exactly what the oracle
    computes.  A hash match proves the merge algebra loses nothing.

    Plan shape, and why it holds at 100 TB: the history is touched only
    through its keys-sized state table; the delta aggregation is the
    sole corpus-shaped scan (partial map-side combines); the merge is
    one full-outer equi-join on the key — exchange-free when the state
    is written bucketed on it.  The decimal state makes the refresh
    idempotent-auditable: re-deriving from scratch at any time
    bit-matches the incrementally maintained table, so drift checks are
    a hash compare, not a tolerance argument."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.where(F.expr(_BASE_PRED))
    delta = orders.where(F.expr(_DELTA_PRED))
    state_v1 = agg_state(base, "o_custkey", "o_totalprice")
    delta_state = agg_state(delta, "o_custkey", "o_totalprice")
    state_v2 = merge_agg_state(state_v1, delta_state, "o_custkey")
    return state_v2.select(
        "o_custkey",
        F.col("n").alias("n_orders"),
        F.col("total_dec").cast("double").alias("total"),
    ).orderBy("o_custkey")
