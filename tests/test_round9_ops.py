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


# ------------------------------------------- pagerank delta driver ----


_EDGES = [
    (1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (1, 3), (5, 1), (5, 3),
    (6, 2), (2, 6), (6, 7), (7, 6), (4, 7),
]


def _ranks(df):
    return {r["id"]: r["rank"] for r in df.collect()}


def test_pagerank_incremental_empty_delta_is_bit_exact(spark, tmp_path):
    """Two k-round refreshes over an unchanged graph must equal one
    2k-round from-scratch run BIT-FOR-BIT (the resume-as-data identity
    carried through the versioned store's parquet round-trip)."""
    from etl_template_spark.operators.graph import pagerank, pagerank_incremental

    root = str(tmp_path)
    edges = spark.createDataFrame(_EDGES, "src long, dst long")
    r1, v1 = pagerank_incremental(spark, root, "pr", edges, iters=3)
    r2, v2 = pagerank_incremental(spark, root, "pr", None, iters=3)
    assert (v1, v2) == (1, 2)
    assert _ranks(r2) == _ranks(pagerank(edges, iters=6))
    assert _ranks(r1) == _ranks(pagerank(edges, iters=3))


def test_pagerank_incremental_delta_converges_to_grown_fixed_point(
    spark, tmp_path
):
    """Warm-start over an edge delta is a convergence contract: each
    refresh decays the perturbation geometrically toward the grown
    graph's unique fixed point (differential vs from-scratch pagerank
    on the grown graph)."""
    from etl_template_spark.operators.graph import pagerank, pagerank_incremental

    root = str(tmp_path)
    base = spark.createDataFrame(_EDGES, "src long, dst long")
    pagerank_incremental(spark, root, "pr", base, iters=6)

    delta = spark.createDataFrame(
        [(8, 1), (1, 8), (8, 3), (7, 8), (2, 4)], "src long, dst long"
    )
    grown = base.unionByName(delta)
    ref = _ranks(pagerank(grown, iters=60))

    r_after_1, _ = pagerank_incremental(spark, root, "pr", delta, iters=6)
    d1 = max(abs(v - ref[k]) for k, v in _ranks(r_after_1).items())
    for _ in range(4):
        r_last, _ = pagerank_incremental(spark, root, "pr", None, iters=6)
    d5 = max(abs(v - ref[k]) for k, v in _ranks(r_last).items())
    assert set(_ranks(r_last)) == set(ref)  # node 8 appeared, none lost
    assert d5 < 1e-3 and d5 < d1 / 5  # geometric decay toward the fixed point


def test_pagerank_incremental_edge_log_stays_delta_sized(spark, tmp_path):
    """The edge log must hold each edge ONCE: a delta overlapping
    already-logged edges commits only the genuinely new ones, and a
    fully-redundant delta commits no edge version at all."""
    from etl_template_spark.io import list_versions, read_versioned
    from etl_template_spark.operators.graph import pagerank_incremental

    root = str(tmp_path)
    base = spark.createDataFrame(_EDGES, "src long, dst long")
    pagerank_incremental(spark, root, "pr", base, iters=2)
    overlap = spark.createDataFrame(
        [(1, 2), (2, 3), (9, 1)], "src long, dst long"  # 2 dupes + 1 new
    )
    pagerank_incremental(spark, root, "pr", overlap, iters=2)
    assert list_versions(root, "pr_edges") == [1, 2]
    v2 = read_versioned(spark, root, "pr_edges", version=2).collect()
    assert [(r["src"], r["dst"]) for r in v2] == [(9, 1)]
    # fully-redundant delta: no new edge version, ranks still advance
    pagerank_incremental(spark, root, "pr", overlap, iters=2)
    assert list_versions(root, "pr_edges") == [1, 2]
    assert list_versions(root, "pr_ranks") == [1, 2, 3]


def test_pagerank_incremental_requires_initial_delta(spark, tmp_path):
    from etl_template_spark.operators.graph import pagerank_incremental

    with pytest.raises(ValueError, match="first call"):
        pagerank_incremental(spark, str(tmp_path), "pr", None, iters=2)
