"""Connected components over a pair graph — duplicate-cluster resolution.

Near-dup detection (dedup.py) emits PAIRS; a training-data pipeline
needs CLUSTERS: if A~B and B~C, then {A, B, C} is one duplicate group
and exactly one member survives.  That is connected components over the
pair graph, with the canonical survivor = min(doc_id) per component.

Algorithm: iterative min-label propagation, pure DataFrame ops —
each round every vertex adopts the smallest label among itself and its
neighbors (one shuffle join + one aggregate per round), until a round
changes nothing.  Rounds needed = the graph's eccentricity from each
component's minimum vertex, i.e. O(component diameter).  Near-dup
clusters are dense and shallow (a template plus its variants — star
shaped, diameter ≤ ~4), so this converges in a handful of rounds even
at corpus scale; for adversarially long path graphs the alternating
large-star/small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14) halves path lengths per round
(O(log n) rounds) — same join/agg building blocks, swap in if diameters
grow.

Scale notes:
- per-round lineage is truncated with ``localCheckpoint(eager=True)``;
  without it the plan doubles every round and Catalyst analysis, not
  the data, becomes the bottleneck by round ~15.
- the convergence check is an aggregate (``isEmpty`` on the changed
  set), never a ``collect()`` of data.
- state per round is one (vertex, label) row per vertex — the frontier
  never exceeds the vertex set, and the join key (vertex id) hash
  partitions evenly unless one vertex is a hub; a hub vertex means a
  near-universal shingle survived the DF cap upstream — fix the cap,
  not the clustering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """(id, component) for every vertex of ``edges``; ``component`` is
    the minimum vertex id reachable from ``id`` (a stable, engine-
    independent canonical label).  Vertices are taken from the edge
    set; isolated vertices don't appear (join them back upstream if
    singleton rows are wanted)."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
    und = e.union(e.select(F.col("t").alias("s"), F.col("s").alias("t")))
    und = und.distinct().localCheckpoint(eager=True)

    labels = (
        und.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neigh = (
            und.join(labels.withColumnRenamed("id", "t"), "t")
            .groupBy(F.col("s").alias("id"))
            .agg(F.min("lbl").alias("neigh_lbl"))
        )
        # carry the changed-flag through the checkpoint so convergence
        # is read off the materialized frame — no second join per round
        upd = (
            labels.join(neigh, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("neigh_lbl"), F.col("lbl"))
                ).alias("lbl"),
                (F.coalesce(F.col("neigh_lbl"), F.col("lbl")) < F.col("lbl")).alias(
                    "__chg"
                ),
            )
            .localCheckpoint(eager=True)
        )
        labels = upd.select("id", "lbl")
        if upd.where(F.col("__chg")).isEmpty():
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(pathological diameter — switch to large-star/small-star)"
        )
    return labels.select("id", F.col("lbl").alias("component"))
