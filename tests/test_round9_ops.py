"""Edge-case unit tests for the round-9 operators: the ddsketch domain
guard (r8 ADVICE enforcement), daily→monthly sketch-rollup merge
equivalence, weighted-PageRank mass conservation, and the stream-join
left-outer batch twin's unmatched-click rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ----------------------------------------------------- sketch domain ----


def test_sketch_bins_rejects_sub_10_cent_values(spark):
    """r8 ADVICE: values < 10 cents have no two-digit p2 — the old code
    silently produced a wrong bin range (1-9) or a null error bound (0).
    The guard must raise at scan time instead."""
    from etl_template_spark.queries.ddsketch import sketch_bins

    bad = spark.createDataFrame([("A", 9), ("A", 1500)], "g string, cents long")
    with pytest.raises(Exception, match="out-of-domain"):
        sketch_bins(bad, "g", F.col("cents")).collect()

    ok = spark.createDataFrame([("A", 10), ("A", 1500)], "g string, cents long")
    bins = {
        (r["d"], r["p2"]): r["cnt"]
        for r in sketch_bins(ok, "g", F.col("cents")).collect()
    }
    assert bins == {(2, 10): 1, (4, 15): 1}


def test_quantile_rollup_merge_equals_direct_build(spark):
    """Shard-merge associativity at the query grain: daily sketches
    merged by SUM(cnt) to monthly must equal the monthly sketch built
    directly from rows (the same identity the oracle differential
    checks cross-engine)."""
    from etl_template_spark.io import load_table
    from etl_template_spark.queries.ddsketch import sketch_bins, sketch_quantiles

    li = load_table(spark, SF, "lineitem").select(
        "l_returnflag",
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
        F.to_date("l_shipdate").alias("ship_day"),
        "l_extendedprice",
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    daily = sketch_bins(li, ["l_returnflag", "ship_month", "ship_day"], cents)
    merged = daily.groupBy("l_returnflag", "ship_month", "d", "p2").agg(
        F.sum("cnt").alias("cnt")
    )
    direct = sketch_bins(li, ["l_returnflag", "ship_month"], cents)

    key = ["l_returnflag", "ship_month", "q"]
    a = sketch_quantiles(merged, ["l_returnflag", "ship_month"])
    b = sketch_quantiles(direct, ["l_returnflag", "ship_month"])
    rows_a = {tuple(r[k] for k in key): r["est"] for r in a.collect()}
    rows_b = {tuple(r[k] for k in key): r["est"] for r in b.collect()}
    assert rows_a == rows_b and len(rows_a) > 0
