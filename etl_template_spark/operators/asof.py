"""As-of join: for each left row, the latest right row with
``right.time <= left.time`` within the same key.

Spark has no ASOF JOIN primitive (DuckDB does — the oracle uses it).
The naive formulation — equi-join on key, filter time, window-rank —
materializes every (left, right) pair per key before ranking: O(n·m)
per key, which detonates at 100 TB on hot keys.

This implementation uses the union + carry-forward pattern instead:

1. tag right rows 0 and left rows 1, union by a common (key, time) spine;
2. one window per key ordered by (time, tag): ``last(right_col,
   ignorenulls=True)`` carries the most recent right values forward;
3. keep only left rows.

Cost: one shuffle on the key + one sort — O(n log n), skew handled by
AQE, no pair blow-up.  Ties at equal time resolve to "right row counts"
(tag orders right rows before left rows), matching ``<=`` semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_tag"
_TIME = "__asof_time"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    value_cols: Sequence[str] | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """Left as-of join; right ``value_cols`` arrive as nullable columns.

    ``tolerance``: optional SQL interval string (e.g. ``'7 days'``) — a
    carried-forward match older than ``left_time - tolerance`` is nulled.
    """
    value_cols = list(value_cols or [c for c in right.columns if c not in (right_on, right_time)])
    # A carried value column may not collide with a LEFT column: the
    # carry-forward loop below would silently overwrite the caller's
    # left-side data (r10 review) — fail the way a plain join surfaces
    # ambiguity, and let the caller alias one side.  (left_on is the
    # join key and exempt by construction: the right key is aliased
    # onto it, never carried.)
    clash = [c for c in value_cols if c in left.columns]
    if clash:
        raise ValueError(
            f"asof_join: value_cols {clash} already exist on the left "
            "frame and would be overwritten — alias them on one side"
        )

    left_spine = left.withColumn(_TAG, F.lit(1)).withColumn(_TIME, F.col(left_time))
    for c in value_cols:
        if c not in left_spine.columns:
            left_spine = left_spine.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    right_spine = right.select(
        F.col(right_on).alias(left_on),
        F.col(right_time).alias(_TIME),
        *[F.col(c) for c in value_cols],
    ).withColumn(_TAG, F.lit(0))
    for c in left.columns:
        if c not in right_spine.columns:
            right_spine = right_spine.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = left_spine.unionByName(right_spine.select(left_spine.columns))

    # Pack all right-side value columns into ONE struct and carry the
    # struct, not the columns individually: a legitimately-NULL field in
    # the latest match stays NULL instead of resurrecting an older
    # non-null value.  The struct itself doubles as the window's unique
    # tiebreaker, so two right rows at the same (key, time) resolve
    # deterministically (last in struct order wins) in every engine and
    # at every parallelism.
    packed = F.when(
        F.col(_TAG) == 0, F.struct(*[F.col(c) for c in value_cols])
    )  # NULL struct for left rows → last(ignorenulls) skips them
    carried = unioned.withColumn("__asof_packed", packed)

    w = (
        Window.partitionBy(left_on)
        .orderBy(F.col(_TIME).asc(), F.col(_TAG).asc(), F.col("__asof_packed").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = F.last("__asof_packed", ignorenulls=True).over(w)
    matched_time = F.last(F.when(F.col(_TAG) == 0, F.col(_TIME)), ignorenulls=True).over(w)
    carried = carried.withColumn("__asof_carry", carry).withColumn(
        "__asof_matched_time", matched_time
    )

    out = carried.where(F.col(_TAG) == 1)
    no_match = F.col("__asof_carry").isNull()
    if tolerance is not None:
        no_match = no_match | (
            F.col("__asof_matched_time") < F.col(_TIME) - F.expr(f"INTERVAL {tolerance}")
        )
    for c in value_cols:
        out = out.withColumn(
            c, F.when(no_match, F.lit(None)).otherwise(F.col("__asof_carry").getField(c))
        )
    return out.drop(_TAG, _TIME, "__asof_packed", "__asof_carry", "__asof_matched_time")
