"""Gap-based sessionization (batch).

Assigns a session id per key: a new session starts when the gap since
the previous event exceeds ``gap``.  Classic lag + cumulative-sum
formulation — two window passes over one shuffle on the key, fully
SQL-expressible (so the DuckDB oracle can state the identical
computation), and linear in rows at any scale.

The streaming flavor (native ``session_window`` with a watermark) lives
in streaming/jobs.py; this batch formulation is its oracle-checkable
twin (SURVEY.md §2B q_sessionize).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int = 1800,
    session_col: str = "session_id",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Add ``session_col``: 1-based session index per key ordered by ts.

    ``tiebreak``: extra ORDER BY columns making the per-key order total
    (required for cross-engine determinism when ts values can tie)."""
    order: list[Column] = [F.col(ts).asc()] + [F.col(c).asc() for c in (tiebreak or [])]
    w_seq = Window.partitionBy(key).orderBy(*order)
    # Epoch micros via an LTZ cast (UTC session): NTZ→numeric casts are
    # illegal in Spark 4, so the gap is computed on unix_micros instead.
    epoch_us = F.unix_micros(F.col(ts).cast("timestamp"))
    prev_us = F.lag(epoch_us).over(w_seq)
    gap = (epoch_us - prev_us).cast("double") / 1.0e6
    is_new = F.when(prev_us.isNull() | (gap > gap_seconds), 1).otherwise(0)
    w_run = w_seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(session_col, F.sum(is_new).over(w_run))
