#!/usr/bin/env python
"""Nightly link-graph authority refresh on the incremental PageRank
tier (round 9): the job that keeps a curation-scale authority score
CURRENT without ever recomputing the graph from scratch.

The graph is the buyer→product interaction graph — edges
(customer, part) from orders⋈lineitem, weight = interaction
multiplicity — and each "night" ingests one slice of orders (here:
order year modulo the night count; a real deployment feeds the day's
landed orders).  Per night:

    delta ingest   orders slice ⋈ lineitem → (src, dst) rows; the
                   driver pre-aggregates to per-pair weights and
                   appends ONE delta-sized version to the edge log
                   (never a graph copy — the 100 TB shape)
    refresh        pagerank_weighted, warm-started from the persisted
                   rank vector (resume-as-data: an unchanged graph
                   refreshes bit-exactly; a changed one converges to
                   the grown fixed point with geometric excess-mass
                   decay)
    audit          top-k authority products from the committed vector

After the last night the delta log is COMPACTED — compact_edge_log
folds the full merged state into one version and prunes history, so
the next refresh scans one version instead of one per night
(prune_versions alone would silently drop old deltas' edges; see
operators/graph.py) — and a final empty-delta refresh proves the
store still advances from exactly where it left off.

Node encoding: customers at ``custkey·2``, parts at ``partkey·2 + 1``
(the same even/odd bipartite encoding as q_pagerank's fixture graph).

Run:  python -m etl_template_spark example link_graph_refresh [sf_dir] [data_root]
Also executed in CI (tests/test_pipeline.py::test_link_graph_refresh_example_runs)
so this document cannot rot.
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import get_spark
from ..io import latest_version, list_versions, load_table
from ..operators.graph import compact_edge_log, pagerank_incremental

SF_DIR = "/root/testdata/sf0.001"
STEP = "authority"
NIGHTS = 3
ITERS = 4


def night_delta(spark: SparkSession, sf_dir: str, night: int) -> DataFrame:
    """The orders slice that 'landed' this night, expanded to one
    (src, dst) interaction row per lineitem — multiplicity IS the
    weight (pagerank_incremental pre-aggregates per pair)."""
    orders = load_table(spark, sf_dir, "orders").where(
        F.year("o_orderdate") % NIGHTS == night
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return (
        orders.select("o_orderkey", "o_custkey")
        .join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_partkey") * 2 + 1).alias("dst"),
        )
    )


def top_products(ranks: DataFrame, k: int = 5) -> list[tuple[int, float]]:
    """Top-k authority PRODUCTS (odd node ids decoded back to partkey);
    bounded driver scalar — k rows."""
    return [
        (r["partkey"], r["rank"])
        for r in ranks.where(F.col("id") % 2 == 1)
        .select(((F.col("id") - 1) / 2).cast("long").alias("partkey"), "rank")
        .orderBy(F.desc("rank"), "partkey")
        .limit(k)
        .collect()
    ]


def run(data_root: str | None = None, sf_dir: str = SF_DIR):
    data_root = data_root or tempfile.mkdtemp(prefix="link_graph_")
    spark = get_spark(app_name="link-graph-refresh-example")
    for night in range(NIGHTS):
        ranks, v = pagerank_incremental(
            spark,
            data_root,
            STEP,
            night_delta(spark, sf_dir, night),
            iters=ITERS,
            weighted=True,
        )
        log_v = latest_version(data_root, f"{STEP}_edges")
        top = ", ".join(f"part {p}:{r:.6f}" for p, r in top_products(ranks))
        print(f"night {night}: ranks v{v} (edge log v{log_v}) top: {top}")
    pruned = compact_edge_log(spark, data_root, STEP)
    versions = list_versions(data_root, f"{STEP}_edges")
    print(f"compacted edge log: pruned {pruned} version(s), now {versions}")
    ranks, v = pagerank_incremental(
        spark, data_root, STEP, None, iters=ITERS, weighted=True
    )
    top = ", ".join(f"part {p}:{r:.6f}" for p, r in top_products(ranks))
    print(f"post-compaction refresh: ranks v{v} top: {top}")
    print(f"root={data_root}")
    return data_root


if __name__ == "__main__":
    run(
        sys.argv[2] if len(sys.argv) > 2 else None,
        sys.argv[1] if len(sys.argv) > 1 else SF_DIR,
    )
