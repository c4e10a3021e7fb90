"""Top-k operators.

Per-group top-k: rank window + filter — one shuffle on the group key;
Spark's window TopK optimization (rank-limit pushdown) keeps per-group
state at k rows.  Order keys must form a total order (callers append a
unique tiebreaker) so results are deterministic across engines and runs.

Global top-k: ``orderBy().limit(k)`` — Spark plans TakeOrderedAndProject,
a per-partition k-heap + driver merge: no global sort, no full shuffle;
exactly the plan you want at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rnk",
    method: str = "row_number",
) -> DataFrame:
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    rank_fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[method]
    return (
        df.withColumn(rank_col, rank_fn().over(w))
        .where(F.col(rank_col) <= k)
    )
