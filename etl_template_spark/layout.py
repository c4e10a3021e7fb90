"""Multi-dimensional data layout: Z-order (Morton) and Hilbert clustering.

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

``with_hilbert`` is the 2-D upgrade: the Hilbert curve visits grid
cells so that consecutive curve positions are ALWAYS adjacent cells
(Morton order jumps across the space at power-of-two boundaries), so
sorted runs cover tighter hyper-rectangles and footer-stats pruning
discards more row groups for the same sort cost — the same reason
modern lakehouse clustering prefers Hilbert over Z-order.  The curve
transform is the classic per-bit rotate/reflect automaton, unrolled
into ``bits`` chained projections of JVM conditional expressions (no
UDF); dimensions beyond 2 fall back to ``with_zorder``.
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


def _with_ranks(
    df: DataFrame, cols: Sequence[str], bits: int
) -> tuple[DataFrame, list[Column], list[str]]:
    """Min/max-normalize each column to a ``bits``-wide integer rank.
    Returns (frame joined with the broadcast 1-row stats, rank
    expressions, stat column names to drop afterwards)."""
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
            # NULLs rank LOW, explicitly (r10 review): without the
            # when(), the NULL arithmetic rode through F.least — which
            # SKIPS null operands — and returned ``top``, silently
            # clustering every null into the keyspace's maximum corner
            # and widening the max region's row-group min/max stats.
            # Rank 0 co-locates nulls with the true minimums: a shared
            # bucket, but a compact one at a single corner.
            F.when(c.isNull(), F.lit(0).cast("long")).otherwise(
                F.least(
                    F.lit(top),
                    F.floor((c - lo) / span * F.lit(top + 1)).cast("long"),
                )
            )
        )
    drop = [f"__zmin_{i}" for i in range(len(cols))] + [
        f"__zmax_{i}" for i in range(len(cols))
    ]
    return joined, ranks, drop


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
    joined, ranks, drop = _with_ranks(df, cols, bits)
    return joined.withColumn(z_col, _interleave(ranks, bits)).drop(*drop)


H_COL = "__hilbert"


def with_hilbert(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    h_col: str = H_COL,
) -> DataFrame:
    """Append a Hilbert-curve position column over exactly TWO columns
    (more dimensions fall back to ``with_zorder`` — the rotate/reflect
    automaton below is the 2-D curve).

    Per-bit loop (classic xy→d conversion), most significant bit first:
    read the quadrant ``(rx, ry)``, add its size-s² contribution to the
    running distance, then rotate/reflect the remaining sub-square so
    the curve's entry corner is canonical.  Each iteration is one chained
    projection of conditional expressions — named intermediates keep the
    expression tree linear in ``bits`` (inlining each step would double
    it per level), and everything stays inside whole-stage codegen."""
    if len(cols) != 2:
        return with_zorder(df, cols, bits=bits, z_col=h_col)
    if 2 * bits > 62:
        raise ValueError(f"{bits} bits × 2 cols overflows a long")
    joined, ranks, drop = _with_ranks(df, cols, bits)
    x, y, d = "__hx", "__hy", "__hd"
    out = (
        joined.withColumn(x, ranks[0])
        .withColumn(y, ranks[1])
        .withColumn(d, F.lit(0).cast("long"))
    )
    for s in (1 << b for b in range(bits - 1, -1, -1)):
        rx = F.shiftright(F.col(x), s.bit_length() - 1).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col(y), s.bit_length() - 1).bitwiseAND(F.lit(1))
        step = F.lit(s * s).cast("long") * (F.lit(3) * rx).bitwiseXOR(ry)
        # lower-half quadrants (ry == 0): reflect when rx == 1, then swap
        refl_x = F.when(rx == 1, F.lit(s - 1) - F.col(x)).otherwise(F.col(x))
        refl_y = F.when(rx == 1, F.lit(s - 1) - F.col(y)).otherwise(F.col(y))
        out = (
            out.withColumn(d, F.col(d) + step)
            .withColumn("__hx_n", F.when(ry == 0, refl_y).otherwise(F.col(x)))
            .withColumn("__hy_n", F.when(ry == 0, refl_x).otherwise(F.col(y)))
            .withColumn(x, F.col("__hx_n").bitwiseAND(F.lit(s - 1)))
            .withColumn(y, F.col("__hy_n").bitwiseAND(F.lit(s - 1)))
            .drop("__hx_n", "__hy_n")
        )
    return out.withColumn(h_col, F.col(d)).drop(x, y, d, *drop)
