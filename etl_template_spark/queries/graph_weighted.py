"""q_pagerank_weighted — weighted PageRank as a registered,
oracle-backed query (round 9, VERDICT r8 #5b; operator at
operators/graph.py::pagerank_weighted).

Same part→supplier fixture graph as q_pagerank (``2*l_partkey →
2*l_suppkey + 1``), but parallel edges now COUNT: the weight of an
edge is its lineitem multiplicity, so a part shipped ten times by a
supplier pushes ten shares of rank where the simple-graph query pushes
one.  The two queries differ exactly where the semantics differ —
same nodes, same dangling supplier side, different contributions —
which is what makes the pair a meaningful regression net (a bug that
ignores weights reproduces q_pagerank's ranks and hash-fails here).

Oracle: the q_pagerank unrolled-CTE chain with weighted edges — ``e``
carries ``COUNT(*) AS w``, out-degree is ``SUM(w)`` (BIGINT-exact),
and the per-edge contribution is the double expression
``r.rank * e.w / d.wdeg`` mirrored operator-side as
``rank * w / wdeg`` (same association order; integer w/wdeg keep the
division the only float op, deterministic in both engines).  All the
decimal-sum/round-9/literal-cast discipline of q_pagerank's oracle
applies unchanged.

Reference parity: the reference engine has no graph operators
(tools.go); declared engine surface per SURVEY §2B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..compat import dsum_sql
from ..io import load_table
from ..operators.graph import pagerank_weighted
from ..registry import register

_ITERS = 6
_DAMPING = 0.85


def _weighted_oracle(iters: int = _ITERS) -> str:
    """Unrolled decimal-exact weighted PageRank rounds; one CTE triple
    (contribs, mass, ranks) per round — q_pagerank's oracle with
    multiplicity weights."""
    n = "(SELECT n FROM nn)"
    teleport = f"(1.0::DOUBLE - {_DAMPING}::DOUBLE) / {n}"
    ctes = [
        "e AS (SELECT l_partkey * 2 AS s, l_suppkey * 2 + 1 AS t,"
        " COUNT(*) AS w FROM lineitem GROUP BY 1, 2)",
        "nodes AS (SELECT s AS id FROM e UNION SELECT t FROM e)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "outdeg AS (SELECT s AS id, CAST(SUM(w) AS BIGINT) AS wdeg"
        " FROM e GROUP BY s)",
        f"r0 AS (SELECT id, 1.0::DOUBLE / {n} AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        ctes.append(
            f"c{i} AS (SELECT e.t AS id,"
            f" {dsum_sql('r.rank * e.w / d.wdeg', 9)} AS inflow"
            f" FROM e JOIN r{p} r ON e.s = r.id JOIN outdeg d ON e.s = d.id"
            f" GROUP BY e.t)"
        )
        ctes.append(
            f"m{i} AS (SELECT {dsum_sql('r.rank', 9)} AS mass"
            f" FROM r{p} r LEFT JOIN outdeg d ON r.id = d.id"
            f" WHERE d.id IS NULL)"
        )
        ctes.append(
            f"r{i} AS (SELECT nodes.id, round({teleport} + {_DAMPING}::DOUBLE *"
            f" (COALESCE(c{i}.inflow, 0.0::DOUBLE)"
            f" + COALESCE((SELECT mass FROM m{i}), 0.0::DOUBLE)"
            f" / CAST({n} AS DOUBLE)), 9) AS rank"
            f" FROM nodes LEFT JOIN c{i} ON nodes.id = c{i}.id)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, round(rank, 9) AS rank FROM r{iters}"
    )


@register(
    "q_pagerank_weighted",
    oracle=_weighted_oracle(),
    tags=("graph", "curation"),
)
def q_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the part→supplier graph, 6 synchronous
    iterations, edge weight = lineitem multiplicity — link-frequency
    authority for curation graphs where repeat interaction should
    count (citation counts, co-click strength), the semantics
    q_pagerank's simple-graph contract deliberately drops."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    return pagerank_weighted(edges, iters=_ITERS, damping=_DAMPING)
