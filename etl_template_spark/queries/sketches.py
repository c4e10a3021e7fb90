"""Mergeable distinct-count sketch: a deterministic, cross-engine
HyperLogLog.

``q_agg_approx`` exposes Spark's built-in ``approx_count_distinct`` —
an engine-internal HLL whose estimates can't be reproduced outside
Spark (it's checked against an exact-count oracle with tolerance).
This module implements the sketch ITSELF in portable relational
algebra, so the same registers — and therefore the same estimate, bit
for bit — come out of Spark, DuckDB, or any engine with sha256 and
integer ops.  That buys three things the built-in can't give:

1. **Reproducibility**: the estimate is a pure function of the data,
   not of accumulator merge order or engine version — the same
   property compat.dsum gives sums, extended to cardinality sketches;
2. **Mergeability as data**: the register table (source × 256 rows of
   ``max(rho)``) is an ordinary DataFrame — union two corpora's
   registers and ``max`` again to merge sketches across 100 TB shards
   or across days, without either engine's opaque binary blobs;
3. **Auditability**: the oracle recomputes the identical sketch in
   DuckDB, so the hash check certifies the whole algorithm, not a
   tolerance band.

Construction (classic HLL, m=256 registers, p=8):
- 48-bit hash ``h`` = first 12 hex chars of sha256(text) (the
  shingle_id precedent, widened);
- register index = ``h % 256``; remaining 40 bits ``w = h div 256``;
- rho = trailing-zero count of ``w`` + 1 (via ``log2(w & -w)`` — exact
  on powers of two in both engines), 41 when ``w = 0``;
- the harmonic sum is kept EXACT by scaling: sum of ``2^(41-rho)``
  per present register plus ``2^41`` per empty register is a BIGINT
  (≤ 256·2^41 = 2^49) — no float accumulation anywhere;
- the estimate divides once in double with the standard alpha and the
  linear-counting small-range correction — identical IEEE op trees in
  both engines.

Scale shape: one projection computes (bucket, rho) per row; registers
are a hash aggregate with map-side partial ``max`` combine — the
entire shuffle payload per source is ≤256 tiny rows no matter the
corpus size.  That is the whole point of a sketch, and here it is
visible in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.hll import hll_estimate, hll_registers
from ..registry import register

_M = 256          # registers (p = 8)
_MAX_RHO = 41     # 40 payload bits + 1
_SCALE = 2 ** _MAX_RHO
# The alpha literals MUST ride the double path in BOTH engines: a bare
# `0.7213 / (1.0 + ...)` parses as DECIMAL in both Spark and DuckDB,
# and the two engines' decimal division rules then produce different
# constants (verified: they differ in the 8th significant digit —
# latent until a fixture leaves the linear-counting branch).  The
# round-6 ADVICE caught this exact class in the BM25 oracle; here every
# literal is written in scientific notation (DOUBLE in both parsers),
# so both engines fold the identical IEEE op tree.
_ALPHA_EXPR = "(0.7213e0 / (1.0e0 + 1.079e0 / 256.0e0))"

_HLL_ORACLE = f"""
    WITH hashed AS (
      SELECT source,
             CAST(concat('0x', substr(sha256(text), 1, 12)) AS BIGINT) AS h
      FROM documents),
    slotted AS (
      SELECT source, h % {_M} AS bucket, h // {_M} AS w FROM hashed),
    regs AS (
      SELECT source, bucket,
             MAX(CASE WHEN w = 0 THEN {_MAX_RHO}
                      ELSE CAST(log2(w & -w) AS INT) + 1 END) AS rho
      FROM slotted GROUP BY source, bucket),
    sketch AS (
      SELECT source,
             CAST(SUM(CAST(2 AS BIGINT) ** ({_MAX_RHO} - rho)) AS BIGINT)
               + ({_M} - COUNT(*)) * CAST({_SCALE} AS BIGINT) AS s_scaled,
             {_M} - COUNT(*) AS v_zero
      FROM regs GROUP BY source),
    est AS (
      SELECT source, v_zero,
             {_ALPHA_EXPR} * {_M}.0e0 * {_M}.0e0 * {_SCALE}.0e0
               / CAST(s_scaled AS DOUBLE) AS e_raw
      FROM sketch),
    exact AS (
      SELECT source, COUNT(DISTINCT text) AS n_exact FROM documents
      GROUP BY source)
    SELECT x.source,
           x.n_exact,
           round(CASE WHEN e.e_raw <= {2.5 * _M}e0 AND e.v_zero > 0
                      THEN {_M}.0e0 * ln({_M}.0e0 / e.v_zero)
                      ELSE e.e_raw END, 4) AS n_hll,
           round((CASE WHEN e.e_raw <= {2.5 * _M}e0 AND e.v_zero > 0
                       THEN {_M}.0e0 * ln({_M}.0e0 / e.v_zero)
                       ELSE e.e_raw END - x.n_exact) / x.n_exact, 6) AS rel_err
    FROM exact x JOIN est e ON x.source = e.source
    ORDER BY x.source
"""


@register("q_agg_hll", oracle=_HLL_ORACLE, tags=("agg", "sketch"))
def q_agg_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct documents (by content) per source, twice: the exact
    count and the deterministic portable HLL estimate (see module
    docstring), with the relative error as the audit column.  The
    register aggregate's shuffle payload is ≤256 rows per source
    regardless of corpus size — the sketch IS the scale story, and the
    strict hash oracle proves both engines build the identical one."""
    d = load_table(spark, sf_dir, "documents")
    regs = hll_registers(d, "text", "source")
    est = hll_estimate(regs, "source")
    exact = d.groupBy("source").agg(F.countDistinct("text").alias("n_exact"))
    return (
        exact.join(est, "source")
        .select(
            "source",
            "n_exact",
            F.round(F.col("estimate"), 4).alias("n_hll"),
            F.round(
                (F.col("estimate") - F.col("n_exact")) / F.col("n_exact"), 6
            ).alias("rel_err"),
        )
    )
