"""Window-function operators (SURVEY.md §2B: q_win_*, q_topk_per_group).

One shuffle on the partition key per window spec; Catalyst collapses
multiple functions over the same (partition, order) into a single
Window node.  Every ORDER BY carries a unique tiebreaker so ranks and
frames are total-order deterministic — identical in Spark, DuckDB, and
across cluster sizes (window results over non-total orders are not
reproducible, which is a correctness bug at any scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.topk import top_k_per_group
from ..registry import register


@register(
    "q_win_rank",
    oracle="""
    SELECT
      o_custkey, o_orderkey, o_totalprice,
      ROW_NUMBER() OVER w AS rn,
      RANK()       OVER w AS rnk,
      DENSE_RANK() OVER w AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_custkey, rn
    """,
    tags=("window",),
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank per customer by order value."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
    )


@register(
    "q_win_analytic",
    oracle="""
    SELECT
      user_id, event_id, ts, value,
      LAG(value)  OVER w                       AS prev_value,
      LEAD(value) OVER w                       AS next_value,
      FIRST_VALUE(event_type) OVER w           AS first_type,
      LAG(ts, 1) OVER w                        AS prev_ts,
      epoch_us(ts) - epoch_us(LAG(ts, 1) OVER w) AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, ts, event_id
    """,
    tags=("window",),
)
def q_win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead / first_value and inter-event gaps per user timeline."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            "value",
            F.lag("value").over(w).alias("prev_value"),
            F.lead("value").over(w).alias("next_value"),
            F.first("event_type").over(w).alias("first_type"),
            F.lag("ts", 1).over(w).alias("prev_ts"),
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.lag("ts", 1).over(w).cast("timestamp"))
            ).alias("gap_us"),
        )
    )


@register(
    "q_win_frame",
    oracle="""
    SELECT
      l_suppkey, l_orderkey, l_linenumber, l_shipdate, l_quantity,
      SUM(l_quantity) OVER (
        PARTITION BY l_suppkey
        ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)                          AS qty_3row,
      SUM(l_quantity) OVER (
        PARTITION BY l_suppkey
        ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)                  AS qty_running,
      SUM(l_quantity) OVER (
        PARTITION BY l_suppkey ORDER BY epoch(l_shipdate)
        RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)                    AS qty_7day
    FROM lineitem
    ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber
    """,
    tags=("window",),
)
def q_win_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS frames (moving 3-row sum, running total) and a time-based
    RANGE frame (trailing 7 days by epoch seconds) per supplier.
    l_quantity is integral so double sums are exact in any order.

    The ROWS ordering carries l_quantity as a FINAL tiebreaker: the
    synthetic fixture does not honor the TPC-H (orderkey, linenumber)
    PK — sf0.1 contains same-key rows with different quantities — so
    without it the 3-row frame straddling such a tie is engine-order-
    dependent (caught by a 10x-scale differential soak; sf0.01 has no
    such collision).  With it, remaining ties are value-identical in
    the only windowed input, so every frame sum is order-invariant."""
    li = load_table(spark, sf_dir, "lineitem")
    w_rows = Window.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"
    )
    w_range = (
        Window.partitionBy("l_suppkey")
        .orderBy(F.unix_seconds(F.col("l_shipdate").cast("timestamp")))
        .rangeBetween(-604800, 0)
    )
    return (
        li.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            "l_shipdate",
            "l_quantity",
            F.sum("l_quantity").over(w_rows.rowsBetween(-2, 0)).alias("qty_3row"),
            F.sum("l_quantity")
            .over(w_rows.rowsBetween(Window.unboundedPreceding, 0))
            .alias("qty_running"),
            F.sum("l_quantity").over(w_range).alias("qty_7day"),
        )
    )


@register(
    "q_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT
        o_custkey, o_orderkey, o_orderdate, o_totalprice,
        ROW_NUMBER() OVER (
          PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders)
    WHERE rnk <= 3
    ORDER BY o_custkey, rnk
    """,
    tags=("window", "topk"),
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by value (operators/topk.py): the rank
    filter is pushed into the window node (WindowGroupLimit) so per-group
    state never exceeds k rows."""
    o = load_table(spark, sf_dir, "orders")
    return (
        top_k_per_group(
            o,
            ["o_custkey"],
            [F.col("o_totalprice").desc(), F.col("o_orderkey")],
            k=3,
        )
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "rnk")
    )


@register(
    "q_win_distribution",
    oracle="""
    SELECT
      o_custkey, o_orderkey, o_totalprice,
      CAST(NTILE(4) OVER w AS INT) AS quartile,
      PERCENT_RANK() OVER w AS pct_rank,
      CUME_DIST()    OVER w AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_custkey, o_totalprice, o_orderkey
    """,
    tags=("window",),
)
def q_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution family: ntile / percent_rank / cume_dist per
    customer.  All three collapse into the single Window node of the
    rank family (one shuffle on o_custkey); percent_rank and cume_dist
    are integer-ratio doubles ((rank-1)/(n-1), n_le/n), so the values
    are bit-identical cross-engine given the total order."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )
