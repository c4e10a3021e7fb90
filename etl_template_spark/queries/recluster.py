"""Incremental re-clustering (SURVEY.md §7 phase-7): fold an
unclustered delta into an existing Z-ordered versioned dataset as a new
immutable version.

The operational loop at scale: a dataset is written Z-ordered (row-group
pruning on both cluster keys), then incremental ingest appends deltas
that are NOT in curve order — each delta is small, and re-sorting the
world per append would cost a full rewrite.  Periodic re-clustering
reads clustered + delta, recomputes the curve position over the merged
key domain, and commits one new version through the same atomic claim
as every write; readers of the old version are never disturbed.  At
100 TB the merge is restricted to affected partitions; the operator
itself is one declarative plan (union → curve projection → range sort →
write) either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table, process_scratch_root, read_versioned, write_versioned
from ..registry import register

_COLS = ["l_orderkey", "l_partkey", "l_linenumber", "l_quantity"]


@register(
    "q_recluster_zorder",
    oracle="""
    SELECT l_orderkey, l_partkey, l_linenumber, l_quantity
    FROM lineitem
    ORDER BY l_orderkey, l_partkey, l_linenumber
    """,
    tags=("sink", "etl", "layout"),
)
def q_recluster_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental Z-order re-clustering: v1 = ~3/4 of lineitem written
    Z-ordered on (l_orderkey, l_partkey); a later delta (the remaining
    1/4) lands unclustered as its own step; re-clustering unions the
    latest clustered version with the delta, recomputes the Morton
    position over the MERGED key domain (layout.py::with_zorder — the
    min/max normalization must see the union, or new key ranges fold
    onto old curve cells), range-sorts, and commits v2.  The oracle
    reads the source parquet: a hash match proves the whole
    base → delta → merge → re-layout → read-back cycle is lossless.
    Physical pruning of the curve layout itself is pinned by
    tests/test_io.py's row-group span assertions for the same
    layout routine (q_sink_zorder)."""
    from ..layout import Z_COL, with_zorder

    # per-(sf_dir, PROCESS) scratch root, WIPED at each build: the demo
    # writes ~2x lineitem (v1 + delta + v2), so a fresh mkdtemp per
    # invocation would accumulate that much dead parquet every time the
    # driver/bench re-builds.  Any frame returned by a PRIOR build in
    # THIS process must already be consumed (true for the differential/
    # bench/driver harnesses, which materialize before re-building).
    # Isolation + dead-process sweep live in io.process_scratch_root
    # (shared with q_version_diff).
    root = process_scratch_root("etl_recluster", sf_dir)
    li = load_table(spark, sf_dir, "lineitem").select(*_COLS)
    base = li.where(F.col("l_orderkey") % 4 != 0)
    delta = li.where(F.col("l_orderkey") % 4 == 0)

    write_versioned(
        with_zorder(base, ["l_orderkey", "l_partkey"], bits=16),
        root, "li", sort_by=[Z_COL], sort_partitions=8,
    )
    write_versioned(delta, root, "li_delta")

    merged = read_versioned(spark, root, "li").select(*_COLS).unionByName(
        read_versioned(spark, root, "li_delta").select(*_COLS)
    )
    write_versioned(
        with_zorder(merged, ["l_orderkey", "l_partkey"], bits=16),
        root, "li", sort_by=[Z_COL], sort_partitions=8,
    )
    return read_versioned(spark, root, "li").select(*_COLS)


@register(
    "q_recluster_hilbert",
    oracle="""
    SELECT l_orderkey, l_partkey, l_linenumber, l_quantity
    FROM lineitem
    ORDER BY l_orderkey, l_partkey, l_linenumber
    """,
    tags=("sink", "etl", "layout"),
)
def q_recluster_hilbert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental HILBERT re-clustering — the last §7 phase-7
    candidate: same operational loop as q_recluster_zorder (clustered v1
    + unclustered delta → recompute curve position over the MERGED key
    domain → range sort → commit v2) but on the Hilbert curve, whose
    consecutive positions are always ADJACENT grid cells (Morton order
    jumps at power-of-two boundaries), so each sorted run covers a
    tighter rectangle and footer-stats pruning discards more row groups
    for the same sort cost — why lakehouse clustering prefers Hilbert
    once the operational loop exists.  The oracle proves the
    base → delta → merge → re-layout → read-back cycle lossless;
    tests/test_io.py asserts the Hilbert transform bit-exact vs the
    classic xy2d automaton and both-dimension pruning for this layout
    routine."""
    from ..layout import H_COL, with_hilbert

    root = process_scratch_root("etl_rehilbert", sf_dir)
    li = load_table(spark, sf_dir, "lineitem").select(*_COLS)
    base = li.where(F.col("l_orderkey") % 4 != 0)
    delta = li.where(F.col("l_orderkey") % 4 == 0)

    write_versioned(
        with_hilbert(base, ["l_orderkey", "l_partkey"], bits=16),
        root, "li", sort_by=[H_COL], sort_partitions=8,
    )
    write_versioned(delta, root, "li_delta")

    merged = read_versioned(spark, root, "li").select(*_COLS).unionByName(
        read_versioned(spark, root, "li_delta").select(*_COLS)
    )
    write_versioned(
        with_hilbert(merged, ["l_orderkey", "l_partkey"], bits=16),
        root, "li", sort_by=[H_COL], sort_partitions=8,
    )
    return read_versioned(spark, root, "li").select(*_COLS)
