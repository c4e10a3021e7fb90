"""Bucketed co-located join: the shuffle must disappear from the plan,
and the result must equal the plain (shuffled) join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_template_spark.bucketing import colocated_join, write_bucketed
from etl_template_spark.io import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "orderkey"),
        "li_bucketed", ["orderkey"], n_buckets=8, sort_cols=["orderkey"],
    )
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "orderkey"),
        "o_bucketed", ["orderkey"], n_buckets=8, sort_cols=["orderkey"],
    )
    return li, o


def test_colocated_join_has_no_shuffle(spark, bucketed_tables):
    """With broadcast disabled (so the planner can't sidestep the
    question on tiny test data), the bucket-co-located SortMergeJoin
    must run with NO shuffle exchange on either side."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, "li_bucketed", "o_bucketed", on=["orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_colocated_join_matches_plain_join(spark, bucketed_tables):
    li, o = bucketed_tables
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(30,6)")).alias("q"),
        )
        .collect()[0]
    )
    bucketed = (
        colocated_join(spark, "li_bucketed", "o_bucketed", on=["orderkey"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(30,6)")).alias("q"),
        )
        .collect()[0]
    )
    assert (plain["n"], plain["q"]) == (bucketed["n"], bucketed["q"])


def test_bucketed_agg_reuses_partitioning(spark, bucketed_tables):
    """groupBy on the bucket key must also avoid the exchange."""
    agg = (
        spark.table("li_bucketed")
        .groupBy("orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
