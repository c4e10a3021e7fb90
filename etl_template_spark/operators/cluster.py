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
(O(log n) rounds) — same join/agg building blocks, implemented below as
``connected_components_star`` for when diameters grow.

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
            "(pathological diameter — switch to connected_components_star)"
        )
    return labels.select("id", F.col("lbl").alias("component"))


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """(id, component) with ``component`` = min vertex id of the
    component — same contract as :func:`connected_components`, but via
    alternating large-star / small-star rounds (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14), which
    converge in O(log n) rounds INDEPENDENT of graph diameter.

    Min-label propagation needs O(diameter) rounds: fine for the
    star-shaped near-dup clusters it serves (diameter ≤ ~4), hopeless
    for a path- or mesh-shaped graph (a 10⁶-hop link chain = 10⁶
    shuffles).  The star alternation instead rewrites the EDGE SET so
    path lengths at least halve per round:

    - large-star(u): with m = min(Γ(u) ∪ {u}), re-point every STRICTLY
      LARGER neighbor v > u at m — emit edge (v, m).
    - small-star(u): on the (hi → lo) canonical orientation, with
      m = min(Γ(u)), re-point every other smaller neighbor AND u
      itself at m.

    Fixed point = disjoint stars centered at each component's minimum
    (the paper's Theorem 1), detected here as edge-set stability.

    Scale notes:
    - per-round cost is two hash aggregates + two equi-joins over the
      CURRENT edge set (which the alternation never grows — both star
      moves map |E| input edges to ≤ |E| output edges, minus
      collapsed duplicates), all on integer keys; no diameter term.
    - each round ends in an eager ``localCheckpoint`` so lineage stays
      one round deep (same discipline as min-label and PageRank).
    - the hot key is the component minimum once a component is nearly
      collapsed — unavoidable for any min-labeled output (the final
      star IS that fan-in); rounds before collapse spread load across
      per-neighborhood minima, which is the algorithm's skew story.
    - convergence check is a symmetric ``exceptAll``-empty test on the
      materialized edge set, never a ``collect()``.

    Prefer :func:`connected_components` for shallow dedup clusters
    (fewer, cheaper rounds there); use this when diameters are unknown
    or adversarial.  Vertices are taken from the edge set, self-loops
    allowed; isolated vertices don't appear (same as min-label)."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    vertices = (
        e.select(F.col("a").alias("id"))
        .union(e.select(F.col("b").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    pairs = (
        e.where(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("hi"), F.least("a", "b").alias("lo"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    if not pairs.isEmpty():
        for _ in range(max_iter):
            # ---- large-star: every v > u re-points at min(Γ(u) ∪ {u})
            und = pairs.select(
                F.col("hi").alias("u"), F.col("lo").alias("v")
            ).union(pairs.select(F.col("lo").alias("u"), F.col("hi").alias("v")))
            mins = (
                und.groupBy("u")
                .agg(F.min("v").alias("mn"))
                .select("u", F.least("u", "mn").alias("m"))
            )
            large = (
                und.join(mins, "u")
                .where(F.col("v") > F.col("u"))  # m ≤ u < v: canonical hi/lo
                .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
                .distinct()
            )
            # ---- small-star: on (hi → lo), re-point N(hi) ∪ {hi} at min
            j = large.join(
                large.groupBy("hi").agg(F.min("lo").alias("m")), "hi"
            )
            nxt = (
                j.where(F.col("lo") != F.col("m"))
                .select(
                    F.greatest("lo", "m").alias("hi"),
                    F.least("lo", "m").alias("lo"),
                )
                .union(j.select("hi", F.col("m").alias("lo")))
                .distinct()
                .localCheckpoint(eager=True)
            )
            done = (
                nxt.exceptAll(pairs).isEmpty()
                and pairs.exceptAll(nxt).isEmpty()
            )
            pairs = nxt
            if done:
                break
        else:
            raise RuntimeError(
                f"connected_components_star did not stabilize in {max_iter} "
                "rounds (expected O(log n) — is the edge set unbounded?)"
            )

    # fixed point is disjoint stars: hi → component min; roots (the
    # minima) and self-loop-only vertices label themselves.
    labels = pairs.select(F.col("hi").alias("id"), F.col("lo").alias("component"))
    return (
        vertices.join(labels, "id", "left")
        .select(
            "id", F.coalesce("component", F.col("id")).alias("component")
        )
    )


def connected_components_incremental(
    spark,
    root: str,
    step: str,
    delta_edges: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> tuple[DataFrame, int]:
    """Exact incremental connected components over an append-only edge
    stream, persisted as a versioned dataset (the graph-tier sibling of
    ``pagerank_incremental``, same store discipline — io.py).

    The refresh needs NO edge log: a component labeling is a SUFFICIENT
    STATISTIC for connectivity under edge ADDITIONS —
    ``CC(E ∪ Δ) == CC(labels(E)-as-edges ∪ Δ)`` exactly, because the
    (id → component) star graph induces the identical partition as
    ``E`` and adding ``Δ`` to equal partitions merges them identically;
    component minima survive since every vertex id is preserved.  So
    each refresh re-clusters ``|V| + |Δ|`` edges (one star edge per
    vertex plus the delta) instead of the FULL pair log — at corpus
    scale the near-dup pair set dwarfs the vertex set, and this is the
    difference between touching the night's pairs and rescanning
    months of them.  Unlike ``pagerank_incremental`` the warm start is
    EXACT (bit-for-bit vs from-scratch, integer labels), not a
    convergence argument.

    State under ``root``: ``{step}_cc`` — the labeling, one full copy
    per refresh (one row per vertex ever seen; the small artifact).
    Because every version is a full copy, old versions are freely
    prunable with ``io.prune_versions`` — unlike pagerank_incremental's
    delta log, where newest-k retention would drop old deltas' edges.
    The incremental-dedup shape this serves: nightly near-dup PAIRS for
    new documents (vs corpus and each other, q_dedup_incremental's
    output) fold into the standing cluster assignment without
    re-scoring the corpus.

    Contracts:
    - refresh(Δ₁)…refresh(Δₙ) ≡ one from-scratch CC over Δ₁∪…∪Δₙ,
      bit-for-bit (differential-tested, including cluster-bridging and
      brand-new-vertex deltas).
    - empty/None ``delta_edges`` is a read-only no-op: returns the
      current labeling and version, commits nothing (the first call
      must therefore bring a non-empty delta).
    - edge DELETIONS are out of contract: removing an edge can split a
      component, which no labeling summary can answer — callers who
      retire documents re-run from scratch over their pair source.

    Returns ``(labels_read_back_from_the_committed_version, version)``.
    """
    from ..io import latest_version, read_versioned, write_versioned

    cc_step = f"{step}_cc"
    prior = latest_version(root, cc_step)
    d = None
    if delta_edges is not None:
        d = delta_edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        if d.isEmpty():
            d = None
    if d is None:
        if prior is None:
            raise ValueError(
                "connected_components_incremental: no labeling exists yet — "
                "the first call must supply a non-empty delta_edges frame"
            )
        return read_versioned(spark, root, cc_step), prior
    if prior is not None:
        base = read_versioned(spark, root, cc_step).select(
            F.col("id").alias("src"), F.col("component").alias("dst")
        )
        d = d.union(base)
    labels = connected_components_star(d, max_iter=max_iter)
    version, _ = write_versioned(labels, root, cc_step)
    return read_versioned(spark, root, cc_step, version=version), version
