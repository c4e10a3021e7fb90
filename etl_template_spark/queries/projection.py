"""Projection and filter operators (SURVEY.md §2B: q_project, q_filter).

q_project is the reference's per-record transform (etl.go:54-60,
``transformSingleRecord``) re-expressed as Column expressions: what the
reference does with one Go closure per record, the engine states
declaratively so Catalyst folds it into the scan stage (whole-stage
codegen, no Python in the loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


@register(
    "q_project",
    oracle="""
    SELECT
      CAST(c_custkey AS VARCHAR)                          AS userId,
      'Processed_' || c_name || '_Individually'           AS processedName,
      c_acctbal * 1.1                                     AS adjusted_bal,
      upper(c_mktsegment)                                 AS segment
    FROM customer
    ORDER BY userId
    """,
    tags=("project",),
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column select / rename / computed scalars — the reference's
    transform step (etl.go:54-60: userId ← id, processedName ←
    'Processed_'+name+'_Individually') as pure projection."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").cast("string").alias("userId"),
        F.concat(F.lit("Processed_"), F.col("c_name"), F.lit("_Individually")).alias(
            "processedName"
        ),
        (F.col("c_acctbal") * 1.1).alias("adjusted_bal"),
        F.upper("c_mktsegment").alias("segment"),
    )


@register(
    "q_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag, l_shipdate
    FROM lineitem
    WHERE (l_quantity BETWEEN 10 AND 20 OR l_returnflag = 'R')
      AND l_discount IN (0.02, 0.05, 0.08)
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_returnflag IS NOT NULL
      AND l_linestatus LIKE 'F%'
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("filter",),
)
def q_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive/disjunctive predicates: BETWEEN, IN, LIKE, IS NOT NULL,
    timestamp bound — all pushed into the parquet scan by Catalyst."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_quantity").between(10, 20) | (F.col("l_returnflag") == "R"))
            & F.col("l_discount").isin(0.02, 0.05, 0.08)
            & (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & F.col("l_returnflag").isNotNull()
            & F.col("l_linestatus").like("F%")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_discount",
            "l_returnflag",
            "l_shipdate",
        )
    )
