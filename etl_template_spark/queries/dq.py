"""q_constraint_check — declarative data-quality assertions (round 8):
a constraint suite evaluated in one pass per table plus one referential
join, emitted as a violation report.

Every production pipeline gates publishes on DQ checks (null rates,
domain membership, value ranges, referential integrity).  The naive
implementation runs one scan per constraint; this operator folds every
single-table constraint into ONE conditional aggregate over its table
— ``SUM(CASE WHEN violated)`` columns computed in the same partial-
aggregated pass — and unpivots the 1-row result into report rows with
``stack``.  Adding a constraint adds a column to the agg, not a scan.
The only multi-table constraint (lineitem → orders referential
integrity) is a single left-anti join count, the join strategy left to
AQE (the FK side is corpus-sized; never forced broadcast).

NULL contract (r8 review): every constraint is written in the VALID
form — ``when(valid, 0).otherwise(1)`` / ``CASE WHEN valid THEN 0 ELSE
1 END`` — so a NULL, which satisfies no predicate, always counts as a
violation.  The violation form (``when(violated, 1).otherwise(0)``)
silently passes NULLs (a NULL predicate falls to otherwise(0)), which
is exactly the corruption a DQ gate exists to catch; both engines have
identical three-valued logic, so the differential can never flag the
difference — the contract has to be chosen, and it is chosen strict.

Scale shape at 100 TB: two full scans (orders, lineitem) with map-side
combine into 1-row aggregates, one anti-join, three 1-row unions — the
report cost is the cost of reading the data once, which is the floor
for any checker that must look at every row.

Reference parity: the reference validates only JSON well-formedness on
scan (FAILFAST, tools.go:516-552) — the engine's quarantine path
(io.py::read_jsonl) covers that; row-content constraints are declared
engine surface per SURVEY §2B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


@register(
    "q_constraint_check",
    oracle="""
    WITH o AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_cust,
             CAST(SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT) AS v_price,
             CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END) AS BIGINT) AS v_status
      FROM orders),
    l AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END) AS BIGINT) AS v_qty,
             CAST(SUM(CASE WHEN l_discount BETWEEN 0 AND 0.1 THEN 0 ELSE 1 END) AS BIGINT) AS v_disc
      FROM lineitem),
    fk AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS v
      FROM lineitem li LEFT JOIN orders o ON li.l_orderkey = o.o_orderkey
      WHERE o.o_orderkey IS NULL)
    SELECT check_name, n_checked, n_violations, n_violations = 0 AS pass
    FROM (
      SELECT 'orders_custkey_not_null' AS check_name, n AS n_checked, v_cust AS n_violations FROM o
      UNION ALL
      SELECT 'orders_totalprice_positive', n, v_price FROM o
      UNION ALL
      SELECT 'orders_status_domain', n, v_status FROM o
      UNION ALL
      SELECT 'lineitem_quantity_range', n, v_qty FROM l
      UNION ALL
      SELECT 'lineitem_discount_range', n, v_disc FROM l
      UNION ALL
      SELECT 'lineitem_orderkey_fk', l.n, fk.v FROM l CROSS JOIN fk)
    """,
    tags=("etl", "dq"),
)
def q_constraint_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-constraint DQ report over orders/lineitem: null check, two
    range checks, a domain check, and lineitem→orders referential
    integrity — one row per constraint with checked/violation counts
    and a pass verdict."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    o_stats = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("v_cust"),
        F.sum(F.when(F.col("o_totalprice") > 0, 0).otherwise(1)).alias("v_price"),
        F.sum(
            F.when(F.col("o_orderstatus").isin("O", "F", "P"), 0).otherwise(1)
        ).alias("v_status"),
    )
    l_stats = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("l_quantity").between(1, 50), 0).otherwise(1)
        ).alias("v_qty"),
        F.sum(
            F.when(F.col("l_discount").between(0, 0.1), 0).otherwise(1)
        ).alias("v_disc"),
    )
    fk_viol = (
        li.join(o.select("o_orderkey"), li["l_orderkey"] == o["o_orderkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("v"))
    )

    o_rows = o_stats.selectExpr(
        "stack(3, "
        "'orders_custkey_not_null', n, v_cust, "
        "'orders_totalprice_positive', n, v_price, "
        "'orders_status_domain', n, v_status"
        ") AS (check_name, n_checked, n_violations)"
    )
    l_rows = l_stats.selectExpr(
        "stack(2, "
        "'lineitem_quantity_range', n, v_qty, "
        "'lineitem_discount_range', n, v_disc"
        ") AS (check_name, n_checked, n_violations)"
    )
    fk_rows = (
        l_stats.select("n")
        .crossJoin(F.broadcast(fk_viol))
        .select(
            F.lit("lineitem_orderkey_fk").alias("check_name"),
            F.col("n").alias("n_checked"),
            F.col("v").alias("n_violations"),
        )
    )
    return (
        o_rows.unionByName(l_rows)
        .unionByName(fk_rows)
        .select(
            "check_name",
            "n_checked",
            "n_violations",
            (F.col("n_violations") == 0).alias("pass"),
        )
    )
