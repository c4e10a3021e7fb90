"""Binned range join: big×big interval joins without an equi key.

The problem shape: left rows carry a point (an event timestamp), right
rows carry an interval [start, end), the predicate is pure containment —
no equi-join key.  Spark's only native plans for this are CartesianProduct
or BroadcastNestedLoopJoin; both compare every left row with every right
row, and BNLJ additionally requires one side to fit in executor memory.
Fine when one side is a bounded dimension (q_join_theta), fatal when both
sides are fact-scaled: at 100 TB neither side broadcasts and an O(n·m)
compare never finishes.

The classic fix (Trino/Databricks call it a *binned* or *bucketed* range
join) manufactures an equi key from time itself:

1. pick a bin width ``w`` (ideally ≥ the typical interval length);
2. a point belongs to exactly one bin: ``floor(t / w)``;
3. an interval overlaps ``floor(start/w) .. floor(end/w)`` — explode it
   to one row per overlapped bin (``sequence()``, JVM-side);
4. equi-join on the bin id, then re-check the exact predicate.

Each (point, interval) pair can only meet in the point's single bin, so
the equi-join produces no duplicate pairs — no distinct pass needed.
Cost: a shuffle on the bin id (hash-partitioned, AQE-splittable) plus a
bounded blow-up of the interval side by ``ceil(len/w)+1`` rows.  With
``w`` ≈ the 95th-percentile interval length the blow-up is ≤ 2× and each
bin's candidate set is local traffic only — the shape survives a 1000×
scale-up because everything is hash partitioning and narrow maps.

Skewed bins (a flash-sale hour) are ordinary equi-join skew: AQE's
skewJoin splitting applies, unlike BNLJ where skew is invisible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BIN = "__range_bin"


def _bin_of(col: Column, width_seconds: int) -> Column:
    # floor-div on epoch seconds; works for TIMESTAMP and TIMESTAMP_NTZ
    # (unix_seconds is illegal on NTZ, so route via to_utc-free cast)
    return F.floor(
        F.unix_seconds(col.cast("timestamp")) / F.lit(width_seconds)
    ).cast("long")


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    width_seconds: int,
    end_inclusive: bool = False,
) -> DataFrame:
    """Join ``points`` to every interval containing ``point_col``.

    ``points`` and ``intervals`` must have disjoint column names (alias
    upstream).  The result carries all columns of both inputs.  Interval
    end is exclusive by default (``start <= t < end``); pass
    ``end_inclusive=True`` for closed intervals.
    """
    p = points.withColumn(_BIN, _bin_of(F.col(point_col), width_seconds))
    i = intervals.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                _bin_of(F.col(start_col), width_seconds),
                _bin_of(F.col(end_col), width_seconds),
            )
        ),
    )
    t = F.col(point_col)
    upper = (t <= F.col(end_col)) if end_inclusive else (t < F.col(end_col))
    exact = (t >= F.col(start_col)) & upper
    return p.join(i, on=_BIN, how="inner").where(exact).drop(_BIN)
