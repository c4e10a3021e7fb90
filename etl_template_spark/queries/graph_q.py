"""q_pagerank — bounded-iteration PageRank as a registered, oracle-backed
query (r7 VERDICT directive #2; operator built + unit-tested in r7 at
operators/graph.py).

Fixture graph: the part→supplier bipartite digraph from lineitem —
``2*l_partkey → 2*l_suppkey + 1`` (parity encoding keeps the two key
spaces disjoint; both are bigints).  Parallel edges collapse (the
operator's documented simple-graph semantics), suppliers have no
out-edges, so the ENTIRE supplier side is dangling — every iteration
exercises the uniform dangling-mass redistribution, not just the happy
path.  At sf0.01 that is ~52k distinct edges over ~2.1k nodes; at
sf0.1, ~500k edges over ~21k nodes — each iteration is one equi-join
plus one hash aggregate plus a 1-row broadcast, so the round cost is
linear in edges at any scale (the textbook MapReduce PageRank, declared
in DataFrames; see operators/graph.py for the scale argument).

Oracle: the SAME fixed ``ITERS`` rounds restated as an UNROLLED CTE
chain (r0 → r1 → … → r6).  Unrolling instead of a recursive CTE is
deliberate: the per-round dangling-mass aggregate over the previous
round's ranks is exactly the aggregation-over-the-recursive-term that
SQL recursion forbids, while a generated chain states each round in
plain ANSI SQL.  Every float decision mirrors the operator: per-edge
contribution ``rank/deg`` is a double division, per-node inflow and the
dangling mass are decimal(30,9)-exact sums cast back to double, the
teleport term is the double expression ``(1.0 - 0.85)/n``, and literals
carry ``::DOUBLE`` casts because bare DuckDB numeric literals are
DECIMAL (the k1-cast lesson from retrieval.py's BM25 oracle).

Reference parity: the reference engine has no graph operators
(tools.go's only data ops are scan/map/count/checkpoint) — this is
declared engine surface beyond the reference, per SURVEY §2B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..compat import dsum_sql
from ..io import load_table
from ..operators.graph import pagerank
from ..registry import register

_ITERS = 6
_DAMPING = 0.85


def _pagerank_oracle(iters: int = _ITERS) -> str:
    """Unrolled decimal-exact PageRank rounds over the lineitem
    bipartite fixture; one CTE triple (contribs, mass, ranks) per
    round."""
    n = "(SELECT n FROM nn)"
    teleport = f"(1.0::DOUBLE - {_DAMPING}::DOUBLE) / {n}"
    ctes = [
        "e AS (SELECT DISTINCT l_partkey * 2 AS s, l_suppkey * 2 + 1 AS t"
        " FROM lineitem)",
        "nodes AS (SELECT s AS id FROM e UNION SELECT t FROM e)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "outdeg AS (SELECT s AS id, COUNT(*) AS deg FROM e GROUP BY s)",
        f"r0 AS (SELECT id, 1.0::DOUBLE / {n} AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        ctes.append(
            f"c{i} AS (SELECT e.t AS id, {dsum_sql('r.rank / d.deg', 9)} AS inflow"
            f" FROM e JOIN r{p} r ON e.s = r.id JOIN outdeg d ON e.s = d.id"
            f" GROUP BY e.t)"
        )
        ctes.append(
            f"m{i} AS (SELECT {dsum_sql('r.rank', 9)} AS mass"
            f" FROM r{p} r LEFT JOIN outdeg d ON r.id = d.id"
            f" WHERE d.id IS NULL)"
        )
        ctes.append(
            # per-round round-9 mirrors the operator's resumable-as-data
            # state (each round's rank vector is exactly representable)
            f"r{i} AS (SELECT nodes.id, round({teleport} + {_DAMPING}::DOUBLE *"
            f" (COALESCE(c{i}.inflow, 0.0::DOUBLE)"
            f" + COALESCE((SELECT mass FROM m{i}), 0.0::DOUBLE)"
            f" / CAST({n} AS DOUBLE)), 9) AS rank"
            f" FROM nodes LEFT JOIN c{i} ON nodes.id = c{i}.id)"
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT id, round(rank, 9) AS rank FROM r{iters}"
    )


@register("q_pagerank", oracle=_pagerank_oracle(), tags=("graph", "curation"))
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part→supplier graph after exactly 6 synchronous
    iterations — authority weighting for curation graphs (link graphs,
    interaction graphs) where in-degree alone over-counts parallel
    paths.

    All determinism lives in the operator (operators/graph.py): decimal-
    exact contribution sums make every iteration bit-identical across
    partitionings, which is what lets a 6-round iterative algorithm be
    hash-compared against a SQL oracle at all."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    return pagerank(edges, iters=_ITERS, damping=_DAMPING)
