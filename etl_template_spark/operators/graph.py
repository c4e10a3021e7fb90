"""Bounded-iteration PageRank over an edge list — graph importance for
curation (authority-weight documents by their link graph, rank users by
interaction graph) beyond what connected components (cluster.py) gives.

Design constraints, in the engine's house style:

- **Fixed iteration count, not convergence-to-epsilon.**  A fixed
  ``iters`` makes the result a pure function of the input — the r8
  registration can restate the same ``iters`` rounds as a recursive-CTE
  oracle and hash-compare, which an epsilon loop (whose round count
  depends on float drift) cannot.  Ten iterations is the classic
  operating point (Brin & Page ran ~50 on the whole web; curation
  graphs are shallower).
- **Integer-exact contribution sums.**  The per-node incoming sum must
  not be a float accumulation (order-dependent on a cluster) NOR a
  double→decimal rounding (round 9: the weighted operator's sf0.1 soak
  caught decimal-cast ties resolving differently across engines).
  With ``R = round(rank·1e9)`` exact per round, each contribution is
  the nearest-nano integer ``(2R + deg) div (2·deg)`` — round-half-up
  of the exact rational R/deg — and inflow/dangling mass are plain
  integer sums, making every iteration — and therefore the final
  ranks — bit-identical at any parallelism and reproducible in DuckDB.
- **Dangling mass redistributed uniformly** (the standard correction):
  nodes with no out-edges leak their rank to all nodes equally;
  without this, total rank drains and scores depend on graph plumbing.
- **Bounded-lineage truncation** with ``localCheckpoint(eager=True)``
  every THIRD round (the cluster.py lesson: the plan, not the data,
  becomes the bottleneck by round ~15 otherwise; every-round
  checkpointing over-corrects — A/B at sf0.1, 517k edges: 16.2 s per-
  round vs 9.3 s every-third, bit-identical ranks, because each eager
  checkpoint materializes the full rank frame and the fixed overhead
  dominates at 6 rounds.  Three rounds of join+agg lineage is well
  inside Catalyst's comfort zone at any ``iters``).

Scale shape per iteration: one equi-join of ranks onto the out-degree-
annotated edge list (both keyed by node — co-partitioned after the
first round), one hash aggregate with map-side partial combine, one
1-row dangling-mass aggregate broadcast back.  State is one row per
node.  O(iters) rounds, each a single shuffle — the textbook
MapReduce PageRank, declared in DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 9  # rank values are small; scale-6 would quantize too coarsely


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    damping: float = 0.85,
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """(id, rank) for every node appearing in ``edges`` (either side),
    after exactly ``iters`` synchronous iterations from the uniform
    start.  Ranks sum to ~1 (dangling mass redistributed).  Rank is
    rounded to scale-9 decimal each round — deterministic across
    engines, runs, and partitionings.

    Multigraph semantics (r7 ADVICE): parallel edges are DEDUPLICATED
    (``.distinct()``) — the graph is treated as unweighted and simple,
    so ten links from A to B contribute exactly what one link would.
    Weighted PageRank (contribution proportional to edge multiplicity)
    is a different operator; pre-aggregate edges to (src, dst, weight)
    and divide by weighted out-degree if that is what you want.

    Raises ``ValueError`` on an empty edge frame: there are no nodes,
    so no rank distribution exists (and the teleport term would divide
    by zero).

    RESUMABLE AS DATA (r8): each round's rank vector is itself rounded
    to scale-9 decimal, so the per-round state is exactly
    representable and iteration composes: ``pagerank(e, iters=a+b)``
    equals ``pagerank(e, iters=b, init_ranks=pagerank(e, iters=a))``
    BIT-FOR-BIT (tests assert it).  That identity is what makes the
    nightly incremental pattern sound — persist the rank vector,
    resume more rounds later, or warm-start after an edge delta
    (``init_ranks`` ranks absent from the new node set are dropped;
    new nodes start at the uniform 1/n — a warm START, not an exact
    delta algorithm; convergence, not equality, is the contract when
    the graph changed)."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).distinct()
    nodes = (
        e.select(F.col("s").alias("id"))
        .union(e.select(F.col("t").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()  # scalar: fixes the teleport term
    if n_nodes == 0:
        raise ValueError("pagerank: empty edge frame — no nodes to rank")
    outdeg = e.groupBy(F.col("s").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    # edges annotated with the source's out-degree, checkpointed once
    e_deg = (
        e.join(outdeg, e["s"] == outdeg["id"])
        .select("s", "t", "deg")
        .localCheckpoint(eager=True)
    )

    if init_ranks is None:
        ranks = nodes.withColumn("rank", F.lit(1.0) / F.lit(float(n_nodes)))
    else:
        # warm start: carried ranks for known nodes, uniform for new
        # ones; ranks for nodes no longer in the graph drop via the join
        ranks = (
            nodes.join(init_ranks.select("id", "rank"), "id", "left")
            .select(
                "id",
                F.coalesce(
                    F.col("rank"), F.lit(1.0) / F.lit(float(n_nodes))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    teleport = (1.0 - damping) / n_nodes
    nano = F.expr("cast(round(rank * 1e9) as bigint)")  # exact: rank is scale-9
    for i in range(iters):
        contribs = (
            e_deg.join(ranks.withColumnRenamed("id", "s"), "s")
            .select(
                F.col("t").alias("id"),
                # nearest-nano of the exact rational R/deg, ties up —
                # pure integer ops (round-9 fix: the float rank/deg +
                # decimal-cast sum carried a double→decimal tie that
                # can resolve differently per engine; the weighted
                # operator's sf0.1 soak caught that class flipping
                # ranks by one nano)
                F.expr(
                    "(2 * cast(round(rank * 1e9) as bigint) + deg)"
                    " div (2 * deg)"
                ).alias("contrib_nano"),
            )
            .groupBy("id")
            .agg(F.sum("contrib_nano").alias("inflow_nano"))
        )
        # dangling mass: rank held by nodes with no out-edges
        dangling = ranks.join(outdeg, "id", "left_anti").agg(
            F.sum(nano).alias("mass_nano")
        )
        d_mass = F.broadcast(dangling)
        ranks = (
            nodes.join(contribs, "id", "left")
            .crossJoin(d_mass)
            .select(
                "id",
                # the round-9 rounding makes each round's rank vector
                # exactly representable — the resume-as-data identity
                F.round(
                    F.lit(teleport)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow_nano"), F.lit(0)).cast("double")
                        / F.lit(1.0e9)
                        + F.coalesce(F.col("mass_nano"), F.lit(0)).cast("double")
                        / F.lit(1.0e9)
                        / F.lit(float(n_nodes))
                    ),
                    _SCALE,
                ).alias("rank"),
            )
        )
        # truncate lineage every third round (and at the end) — see the
        # module docstring's A/B for why not every round
        if (i + 1) % 3 == 0 or i == iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("id", F.round(F.col("rank"), _SCALE).alias("rank"))


def pagerank_weighted(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iters: int = 10,
    damping: float = 0.85,
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """Weighted PageRank (round 9 — the operator ``pagerank``'s
    docstring names as distinct): contribution proportional to edge
    WEIGHT, out-flow normalized by the source's weighted out-degree —
    ten links from A to B carry ten times one link's rank, the
    multigraph semantics the simple-graph operator deliberately
    collapses.

    ``weight=None`` uses parallel-edge MULTIPLICITY (``count(*)`` per
    (src, dst) pair); a named column is summed per pair.  Weights are
    cast to long — integral multiplicities keep the weighted out-degree
    an exact integer sum.

    Contribution arithmetic is PURE INTEGER (round 9 — the sf0.1 soak
    caught the float formulation flipping 324/21000 ranks by one nano
    between engines): with ``R = round(rank·1e9)`` (exact — rank is a
    scale-9 decimal), the per-edge contribution is the nearest-nano
    integer ``(2·R·w + wdeg) div (2·wdeg)`` (round-half-up of the exact
    rational ``R·w/wdeg`` — no double division, no double→decimal cast
    whose tie can resolve differently per engine), and the dangling
    mass is the integer sum of the dangling ``R``.  Only the final
    per-round update touches doubles (``teleport + d·(inflow_nano/1e9 +
    mass_nano/1e9/n)``, then round-9) — bit-identical given identical
    integer inputs, the same shape ``pagerank``'s soaks have proven.
    Overflow bound: ``2·R·w + wdeg`` must fit int64, i.e. per-pair
    weight < ~4.6e9 — any real multiplicity.  Dangling redistribution,
    scale-9 per-round rounding, lineage-truncation cadence, and the
    empty-graph guard all mirror ``pagerank``; per-iteration cost is
    identical (the weight rides the same equi-join).

    RESUMABLE AS DATA, like ``pagerank`` (late round 9): the per-round
    rank vector is a scale-9 decimal, exactly representable, so
    ``pagerank_weighted(e, iters=a+b)`` equals the ``init_ranks``
    continuation bit-for-bit (tests assert it) — what the weighted
    flavor of ``pagerank_incremental`` warm-starts from.
    """
    cols = [F.col(src).alias("s"), F.col(dst).alias("t")]
    if weight is not None:
        cols.append(F.col(weight).cast("long").alias("_w"))
    w_expr = (
        F.count(F.lit(1)).alias("w")
        if weight is None
        else F.sum(F.col("_w")).alias("w")
    )
    e = edges.select(*cols).groupBy("s", "t").agg(w_expr)
    nodes = (
        e.select(F.col("s").alias("id"))
        .union(e.select(F.col("t").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("pagerank_weighted: empty edge frame — no nodes to rank")
    outdeg = e.groupBy(F.col("s").alias("id")).agg(F.sum("w").alias("wdeg"))
    e_deg = (
        e.join(outdeg, e["s"] == outdeg["id"])
        .select("s", "t", "w", "wdeg")
        .localCheckpoint(eager=True)
    )
    if init_ranks is None:
        ranks = nodes.withColumn("rank", F.lit(1.0) / F.lit(float(n_nodes)))
    else:
        # warm start, mirroring ``pagerank``: carried ranks for known
        # nodes, uniform for new ones, departed nodes drop via the join
        ranks = (
            nodes.join(init_ranks.select("id", "rank"), "id", "left")
            .select(
                "id",
                F.coalesce(
                    F.col("rank"), F.lit(1.0) / F.lit(float(n_nodes))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    teleport = (1.0 - damping) / n_nodes
    nano = F.expr("cast(round(rank * 1e9) as bigint)")  # exact: rank is scale-9
    for i in range(iters):
        contribs = (
            e_deg.join(ranks.withColumnRenamed("id", "s"), "s")
            .select(
                F.col("t").alias("id"),
                # nearest-nano of the exact rational R*w/wdeg, ties up —
                # integer ops only, bit-identical in any engine
                F.expr(
                    "(2 * cast(round(rank * 1e9) as bigint) * w + wdeg)"
                    " div (2 * wdeg)"
                ).alias("contrib_nano"),
            )
            .groupBy("id")
            .agg(F.sum("contrib_nano").alias("inflow_nano"))
        )
        dangling = ranks.join(outdeg, "id", "left_anti").agg(
            F.sum(nano).alias("mass_nano")
        )
        d_mass = F.broadcast(dangling)
        ranks = (
            nodes.join(contribs, "id", "left")
            .crossJoin(d_mass)
            .select(
                "id",
                F.round(
                    F.lit(teleport)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow_nano"), F.lit(0)).cast("double")
                        / F.lit(1.0e9)
                        + F.coalesce(F.col("mass_nano"), F.lit(0)).cast("double")
                        / F.lit(1.0e9)
                        / F.lit(float(n_nodes))
                    ),
                    _SCALE,
                ).alias("rank"),
            )
        )
        if (i + 1) % 3 == 0 or i == iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("id", F.round(F.col("rank"), _SCALE).alias("rank"))


def pagerank_incremental(
    spark,
    root: str,
    step: str,
    delta_edges: DataFrame | None = None,
    iters: int = 4,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weighted: bool = False,
    weight: str | None = None,
) -> tuple[DataFrame, int]:
    """Delta-round PageRank driver (round 9, VERDICT r8 #2): persist the
    rank vector as a versioned dataset and advance it over edge DELTAS,
    built on the proven resume-as-data identity
    (``pagerank(iters=a+b) == resume``, bit-for-bit — see ``pagerank``).

    State layout under ``root``:

    - ``{step}_edges`` — an append-only DELTA LOG: each call that brings
      genuinely new edges commits ONE version holding only the edges not
      already in the log (left-anti against the merged history), so at
      100 TB each nightly version is delta-sized, never a graph copy.
      The current edge set is the distinct union of all versions —
      ``read_versioned_merged`` prunes on ``_version`` like partitions.
    - ``{step}_ranks`` — the rank vector, full copy per refresh (one row
      per node; the SMALL artifact).  The latest version warm-starts the
      next refresh.

    Each call runs exactly ``iters`` synchronous rounds from the
    persisted warm start and commits the result as the next rank
    version.  Contracts, matching ``pagerank``'s docstring:

    - **Empty delta ⇒ bit-exact composition.**  Two calls of ``iters=k``
      over an unchanged graph equal one ``pagerank(iters=2k)`` run
      bit-for-bit (scale-9 decimal rounds are exactly representable;
      parquet round-trips doubles exactly).  Tested.
    - **Non-empty delta ⇒ convergence, not equality.**  Ranks carried
      for surviving nodes, uniform 1/n for new ones; the perturbation's
      excess mass decays geometrically (~``damping**rounds``) toward the
      grown graph's unique fixed point.  Differential-tested against
      from-scratch ``pagerank`` on the grown graph.

    **Weighted flavor** (late round 9 — the r9 SURVEY's declared
    library continuation): ``weighted=True`` switches the log to
    ADDITIVE (src, dst, w) deltas and drives ``pagerank_weighted`` with
    the same warm start.  Each delta is pre-aggregated per pair
    (``weight=None`` counts multiplicity, a named column sums); the
    per-pair weight in force is the SUM across all log versions, and a
    NEGATIVE delta subtracts — a pair whose running total falls to
    ``<= 0`` leaves the graph (tombstone semantics, the edge-removal
    the simple log cannot express; an over-removed pair stays negative
    in the log, so later additions resume from the true total).
    Additivity replaces the simple log's anti-join dedup: redelivering
    the same weighted delta DOUBLE-COUNTS by design — feed it
    exactly-once (e.g. from the versioned store's committed batches).
    A log is one mode for life; mixing modes raises ``ValueError``
    (schema-checked).  Both contracts above carry over verbatim — the
    empty-delta refresh is bit-exact by the weighted resume identity,
    deltas converge to the grown weighted fixed point.

    Returns ``(ranks_read_back_from_the_committed_version, version)`` —
    the caller observes exactly what the store now holds.
    """
    from ..io import (
        latest_version,
        read_versioned,
        read_versioned_merged,
        write_versioned,
    )

    edges_step, ranks_step = f"{step}_edges", f"{step}_ranks"
    have_log = latest_version(root, edges_step) is not None
    if have_log:
        log_weighted = "w" in read_versioned(spark, root, edges_step).columns
        if log_weighted != weighted:
            raise ValueError(
                f"pagerank_incremental: the {edges_step!r} log is "
                f"{'weighted' if log_weighted else 'simple'} but the call "
                f"asked for {'weighted' if weighted else 'simple'} mode — "
                "a log is one mode for life"
            )
    if delta_edges is not None:
        if weighted:
            w_expr = (
                F.count(F.lit(1)).cast("long").alias("w")
                if weight is None
                else F.sum(F.col(weight).cast("long")).alias("w")
            )
            d = (
                delta_edges.select(
                    F.col(src).alias("src"), F.col(dst).alias("dst"),
                    *([] if weight is None else [F.col(weight)]),
                )
                .groupBy("src", "dst")
                .agg(w_expr)
                .where(F.col("w") != 0)
            )
        else:
            d = delta_edges.select(
                F.col(src).alias("src"), F.col(dst).alias("dst")
            ).distinct()
            if have_log:
                seen = read_versioned_merged(spark, root, edges_step).select(
                    "src", "dst"
                )
                d = d.join(seen, ["src", "dst"], "left_anti")
        if not d.isEmpty():
            write_versioned(d, root, edges_step)
            have_log = True
    if not have_log:
        raise ValueError(
            "pagerank_incremental: no edge log exists yet — the first call "
            "must supply a non-empty delta_edges frame"
        )
    prior = latest_version(root, ranks_step)
    init = read_versioned(spark, root, ranks_step) if prior is not None else None
    if weighted:
        edges = (
            read_versioned_merged(spark, root, edges_step)
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
            .where(F.col("w") > 0)
        )
        ranks = pagerank_weighted(
            edges, weight="w", iters=iters, damping=damping, init_ranks=init
        )
    else:
        edges = read_versioned_merged(spark, root, edges_step).select(
            "src", "dst"
        )
        ranks = pagerank(edges, iters=iters, damping=damping, init_ranks=init)
    version, _ = write_versioned(ranks, root, ranks_step)
    return read_versioned(spark, root, ranks_step, version=version), version


def compact_edge_log(
    spark,
    root: str,
    step: str,
    min_claim_age: float = 3600.0,
) -> int:
    """Fold ``pagerank_incremental``'s ``{step}_edges`` delta log into
    ONE version and prune the history (late round 9 — the r9 SURVEY's
    declared retention-GC continuation).  Returns the number of log
    versions pruned.

    ``prune_versions`` alone is the WRONG retention tool for a delta
    log: it keeps the newest-k versions, but a delta log's versions are
    not self-contained snapshots — dropping an old delta silently
    removes its edges from the merged view.  Compaction first rewrites
    the log's FULL merged state as a single new version (``distinct``
    pairs for a simple log; per-pair summed ``w`` for a weighted one,
    zero totals dropped, NEGATIVE totals kept — an over-removed pair
    must keep absorbing later additions from its true running total,
    so only exact zeroes are dead rows), then prunes everything older.
    The merged view is provably identical before and after (tested
    bit-for-bit via an empty-delta refresh), and the next refresh scans
    one version instead of one per historical delta — the same
    small-file/many-version economics ``io.compact_versioned`` states,
    applied to log semantics it cannot know.

    Crash-atomicity and concurrent readers (r9 ADVICE — this closes
    what the r9 review flagged as the weighted log's double-count
    window): the folded version commits WITH a ``_SUMMARIZES`` marker
    listing the delta version ids it folds, and
    ``io.read_versioned_merged`` excludes marked versions, so at every
    point — before the fold commits, between commit and prune, after a
    crash mid-prune — the merged weighted view sums each delta exactly
    once.  Recovery after a crash is therefore: run ``compact_edge_log``
    (or ``prune_versions``) again; RE-compacting folds the
    already-excluded view and can never double a pair weight.  Log
    WRITERS (``pagerank_incremental`` ingests) must still not race the
    fold — run compaction in the same serial maintenance window as the
    refreshes.  ``min_claim_age`` passes through to
    ``prune_versions``'s concurrent-claim grace.
    """
    from ..io import (
        latest_version,
        list_versions,
        prune_versions,
        read_versioned,
        read_versioned_merged,
        write_versioned,
    )

    edges_step = f"{step}_edges"
    if latest_version(root, edges_step) is None:
        raise FileNotFoundError(
            f"compact_edge_log: no {edges_step!r} log under {root!r}"
        )
    folded_ids = list_versions(root, edges_step)
    # same-snapshot pin as io.compact_merged_log: the marker must list
    # EXACTLY what the fold read, so a delta committing between this
    # listing and the fold stays a live (unfolded, unmarked) delta
    merged = read_versioned_merged(spark, root, edges_step, versions=folded_ids)
    if "w" in merged.columns:
        folded = (
            merged.groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
            .where(F.col("w") != 0)
        )
    else:
        folded = merged.select("src", "dst").distinct()
    write_versioned(folded, root, edges_step, summarizes=folded_ids)
    return len(
        prune_versions(
            root, edges_step, keep_last=1, min_claim_age=min_claim_age
        )
    )
