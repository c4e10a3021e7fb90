"""Sort / limit / set operators (SURVEY.md §2B: q_sort_limit, q_union,
q_intersect, q_except, q_distinct).

Global top-k via orderBy().limit() plans TakeOrderedAndProject — a
per-partition bounded heap merged on the driver, not a global sort.
Set ops are hash-based distinct shuffles; *ALL variants avoid the
distinct and are union-cheap (no shuffle at all for UNION ALL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


@register(
    "q_sort_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey
    LIMIT 25
    """,
    tags=("sort", "topk"),
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global top-k (25 most valuable orders)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderdate").asc(), F.col("o_orderkey"))
        .limit(25)
    )


@register(
    "q_union",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_acctbal > 5000
    ORDER BY c_custkey, c_mktsegment
    """,
    tags=("setop",),
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics — overlapping rows appear twice)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    building = c.where(F.col("c_mktsegment") == "BUILDING")
    rich = load_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 5000).select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return building.unionByName(rich)


@register(
    "q_union_distinct",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_acctbal > 5000
    ORDER BY c_custkey
    """,
    tags=("setop",),
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (set semantics: union + hash distinct)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    building = c.where(F.col("c_mktsegment") == "BUILDING")
    rich = load_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 5000).select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return building.unionByName(rich).distinct()


@register(
    "q_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 2000
    ORDER BY c_custkey
    """,
    tags=("setop",),
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics)."""
    c = load_table(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY")).select("c_custkey")
    b = c.where(F.col("c_acctbal") > 2000).select("c_custkey")
    return a.intersect(b)


@register(
    "q_except",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_acctbal > 2000
    ORDER BY c_custkey
    """,
    tags=("setop",),
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics)."""
    c = load_table(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY")).select("c_custkey")
    b = c.where(F.col("c_acctbal") > 2000).select("c_custkey")
    return a.subtract(b)


@register(
    "q_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus
    FROM lineitem
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("setop",),
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate elimination on a projected key pair — partial (map-side)
    distinct means the shuffle carries #distinct values, not #rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()
