"""Cross-engine deterministic aggregation helpers.

The correctness harness hash-compares Spark results against a DuckDB
oracle (order-insensitive value hash).  Floating-point SUM/AVG are
order-dependent, and Spark's partial aggregation order differs from
DuckDB's — so a naive ``sum(double)`` can differ in the last ulps and
fail an exact hash even when both engines are "right".

The fix used throughout the query inventory: round each input to a
fixed decimal scale (a deterministic per-value operation that both
engines perform identically on identical IEEE doubles), sum EXACTLY in
decimal arithmetic, then cast the exact decimal back to double (again
deterministic: correctly-rounded nearest double).  Result: bit-identical
sums regardless of accumulation order, in either engine, at any
parallelism — which also means results are reproducible run-to-run on a
1000-executor cluster, not just equal to DuckDB.

A double can be exactly half-way between two scale-6 decimals only if
it equals odd/10^7, which is not a dyadic rational — so tie-breaking
mode differences between engines can never be observed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# decimal(30, s) leaves 30-s integer digits: at scale 6 that is 10^24 —
# ample headroom for 100 TB-scale sums of price-like values.
_PRECISION = 30


def dec(col: Column | str, scale: int = 6) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({_PRECISION},{scale})")


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Order-independent double sum (exact decimal accumulation)."""
    return F.sum(dec(col, scale)).cast("double")


def davg(col: Column | str, scale: int = 6) -> Column:
    """Order-independent double mean: exact decimal sum / count, divided
    in double (both engines perform the identical IEEE division)."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def dsum_sql(expr: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({_PRECISION},{scale}))) AS DOUBLE)"


def davg_sql(expr: str, scale: int = 6) -> str:
    return f"({dsum_sql(expr, scale)} / COUNT({expr}))"
