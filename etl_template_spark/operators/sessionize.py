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
) -> DataFrame:
    """Add ``session_col``: 1-based session index per key ordered by ts."""
    order: list[Column] = [F.col(ts).asc()]
    w_seq = Window.partitionBy(key).orderBy(*order)
    prev_ts = F.lag(ts).over(w_seq)
    gap = F.col(ts).cast("double") - prev_ts.cast("double")
    is_new = F.when(prev_ts.isNull() | (gap > gap_seconds), 1).otherwise(0)
    w_run = w_seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(session_col, F.sum(is_new).over(w_run))
