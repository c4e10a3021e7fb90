"""Multi-dimensional data layout: Z-order (Morton) clustering.

``write_versioned(sort_by=[k])`` clusters row groups on ONE key — a
filter on k prunes groups by min/max, but a filter on any other column
still reads everything.  Z-ordering interleaves the bits of several
keys into one sort key, so proximity in the z-value implies proximity
in EVERY participating dimension: after a range-partition + sort on
the z-value, each parquet row group covers a small hyper-rectangle of
the key space, and a selective filter on ANY of the z-columns rules
out most groups on footer statistics alone.  (Same layout idea as
Delta/Iceberg ``ZORDER BY``; ~log-factor weaker per-dimension than a
dedicated single-key sort, vastly better on every non-leading key.)

Everything is JVM-side expression work:

1. each column is normalized to a ``bits``-wide integer rank via
   min/max scaling (one tiny 1-row aggregate, broadcast-joined — no
   window over a single partition, which would serialize the job);
2. the z-value is the bitwise interleave of the ranks — a fold of
   ``shiftleft``/``bitwiseAND`` terms, constant-folded by Catalyst;
3. callers pass the z-column to ``write_versioned(sort_by=[...])``,
   which range-partitions + sorts — the write path stays unchanged.

Monotone-invariant: min/max normalization preserves order per
dimension, so range predicates map to contiguous rank ranges.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_COL = "__zorder"


def _interleave(ranks: Sequence[Column], bits: int) -> Column:
    """Interleave ``bits`` bits of each rank column: bit b of rank i
    lands at position b * n_cols + i (LSB-first round-robin)."""
    n = len(ranks)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r, b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * n + i)
    return z


def with_zorder(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    z_col: str = Z_COL,
) -> DataFrame:
    """Append a Morton z-value column interleaving ``cols`` (numeric or
    timestamp).  ``bits`` per dimension; total bits = bits * len(cols)
    must fit a signed long (≤ 62)."""
    if not cols:
        raise ValueError("zorder needs at least one column")
    if bits * len(cols) > 62:
        raise ValueError(f"{bits} bits × {len(cols)} cols overflows a long")
    numeric = [F.col(c).cast("double") for c in cols]
    stats = df.agg(
        *[F.min(c).alias(f"__zmin_{i}") for i, c in enumerate(numeric)],
        *[F.max(c).alias(f"__zmax_{i}") for i, c in enumerate(numeric)],
    )
    top = (1 << bits) - 1
    joined = df.join(F.broadcast(stats))
    ranks = []
    for i, c in enumerate(numeric):
        lo, hi = F.col(f"__zmin_{i}"), F.col(f"__zmax_{i}")
        span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
        ranks.append(
            F.least(
                F.lit(top),
                F.floor((c - lo) / span * F.lit(top + 1)).cast("long"),
            )
        )
    return joined.withColumn(z_col, _interleave(ranks, bits)).drop(
        *[f"__zmin_{i}" for i in range(len(cols))],
        *[f"__zmax_{i}" for i in range(len(cols))],
    )
