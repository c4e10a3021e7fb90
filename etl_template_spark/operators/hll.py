"""Portable HyperLogLog building blocks (see queries/sketches.py for
the full design rationale: deterministic cross-engine registers,
mergeable-as-data, exact integer harmonic sums).

Split out as an operator so the register construction exists ONCE —
the registered query, the shard-merge property test, and any pipeline
that maintains a long-lived register table all build the identical
sketch (a drifted copy would silently break mergeability)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M = 256          # registers (p = 8)
MAX_RHO = 41     # 40 payload bits + 1
SCALE = 2 ** MAX_RHO


def hll_slots(col: Column) -> list[Column]:
    """(bucket, w) for a string column: 48-bit sha256-derived hash,
    low 8 bits select the register, the remaining 40 carry the rho
    payload.  DuckDB mirror:
    ``CAST(concat('0x', substr(sha256(x),1,12)) AS BIGINT)``."""
    h = F.conv(F.substring(F.sha2(col, 256), 1, 12), 16, 10).cast("bigint")
    return [(h % M).alias("bucket"), (h - (h % M)).alias("__hi")]


def hll_registers(df: DataFrame, col: str, *keys: str) -> DataFrame:
    """Register table for ``df[col]``, optionally per group ``keys``:
    one row per (key..., bucket) with the max rho.  Mergeable: union
    two corpora's register tables and ``max(rho)`` per bucket again.
    The aggregate partial-combines map-side, so the shuffle payload is
    <= 256 rows per group no matter the input size."""
    slotted = df.select(*keys, *hll_slots(F.col(col))).withColumn(
        "w", F.expr(f"__hi div {M}")
    )
    rho = F.when(F.col("w") == 0, F.lit(MAX_RHO)).otherwise(
        F.expr("cast(log2(w & -w) as int) + 1")
    )
    return (
        slotted.withColumn("rho", rho)
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, *keys: str) -> DataFrame:
    """Cardinality estimate per group from a register table: exact
    integer harmonic sum (2^(MAX_RHO - rho) per register, 2^MAX_RHO per
    empty register — all < 2^53, so double addition is exact in any
    order), then ONE double division with the standard alpha and the
    linear-counting small-range correction.  Every float literal rides
    the double path in both engines (queries/sketches.py documents the
    decimal-literal hazard this avoids)."""
    sketch = registers.groupBy(*keys).agg(
        (
            F.sum(F.expr(f"cast(pow(2, {MAX_RHO} - rho) as bigint)"))
            + (M - F.count(F.lit(1))) * F.lit(SCALE).cast("bigint")
        ).alias("s_scaled"),
        (M - F.count(F.lit(1))).alias("v_zero"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    e_raw = (
        F.lit(alpha)
        * F.lit(float(M))
        * F.lit(float(M))
        * F.lit(float(SCALE))
        / F.col("s_scaled").cast("double")
    )
    est = sketch.select(*keys, "v_zero", e_raw.alias("e_raw"))
    corrected = F.when(
        (F.col("e_raw") <= 2.5 * M) & (F.col("v_zero") > 0),
        F.lit(float(M)) * F.log(F.lit(float(M)) / F.col("v_zero")),
    ).otherwise(F.col("e_raw"))
    return est.select(*keys, corrected.alias("estimate"))
