"""Changelog apply / CDC MERGE (round 7): advance a versioned dataset
from version N to N+1 by applying the N→N+1 changelog, never re-reading
the full refresh.

This is the second half of the audit loop ``q_version_diff`` opened in
round 6.  ``diff_versions`` answers "what changed between refresh N and
N+1"; ``apply_changelog`` (io.py) is the incremental consumer's MERGE
that turns a materialized copy of version N plus that bounded changelog
back into version N+1 — the reference's checkpointed-resume story
(tools.go:676-806) generalized from step granularity to dataset
granularity.  The correctness contract is exact round-trip identity:

    apply_changelog(v1, diff_versions(v1, v2)) == v2   (bit-for-bit)

which the oracle checks by restating v2 directly from the source table —
a hash match proves write → claim → pinned read → diff → merge is
lossless end-to-end, including the float mutation path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import (
    apply_changelog,
    diff_versions,
    load_table,
    process_scratch_root,
    read_versioned,
    write_versioned,
)
from ..registry import register

# Same v1/v2 membership + mutation rules as q_version_diff
# (versiondiff.py), stated once and mirrored in SQL: v1 keeps orderkeys
# % 4 != 0 at the original price; v2 keeps % 3 != 0 with a 10% uplift
# where % 5 == 0 (one IEEE double multiply — deterministic cross-engine,
# proven by q_version_diff's round-6 hash match).
_V1_PRED = "o_orderkey % 4 != 0"
_V2_PRED = "o_orderkey % 3 != 0"
_UPLIFT_PRED = "o_orderkey % 5 = 0"


@register(
    "q_changelog_apply",
    oracle=f"""
    SELECT o_orderkey,
           CASE WHEN {_UPLIFT_PRED} THEN o_totalprice * 1.1
                ELSE o_totalprice END AS price
    FROM orders WHERE {_V2_PRED}
    ORDER BY o_orderkey
    """,
    tags=("etl", "versioned", "audit", "cdc"),
)
def q_changelog_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE round-trip: commit v1 and v2 of an ``orders_curated``
    step through the real versioned-sink path, diff them with
    ``io.diff_versions`` (pinned reads, full-outer key join), then apply
    that changelog back onto v1 with ``io.apply_changelog`` and return
    the merged frame — which must be bit-identical to v2.  The oracle
    restates v2 straight from the source table, so the hash match
    certifies the whole diff→merge cycle, not just the diff.

    Merge semantics exercised: 'removed' keys (in v1 only — %4 survivors
    divisible by 3) anti-join out; 'added' keys (in v2 only) insert at
    their new values; 'changed' keys (%5 uplift intersection) replace
    their price.  Unchanged rows pass through untouched from v1 — they
    never appear in the changelog at all.

    Plan shape, and why it holds at 100 TB: the merge never rewrites or
    re-shuffles the base beyond one left-anti equi-join on the dataset
    key against the changelog keys (AQE broadcasts the bounded delta;
    a rewrite-sized changelog degrades to sort-merge instead of an OOM)
    plus a union with the changelog's own upsert rows — one scan over
    version N, touching none of version N+1's files.  The diff side is
    q_version_diff's sort-merge full-outer join, exchange-free when the
    versions are written bucketed (bucketing.py)."""
    root = process_scratch_root("etl_capply", sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    v1_df = orders.where(F.expr(_V1_PRED)).select(
        "o_orderkey", F.col("o_totalprice").alias("price")
    )
    v2_df = orders.where(F.expr(_V2_PRED)).select(
        "o_orderkey",
        F.when(F.expr(_UPLIFT_PRED), F.col("o_totalprice") * 1.1)
        .otherwise(F.col("o_totalprice"))
        .alias("price"),
    )
    write_versioned(v1_df, root, "orders_curated")
    write_versioned(v2_df, root, "orders_curated")

    changelog = diff_versions(
        spark, root, "orders_curated", key="o_orderkey", v_old=1, v_new=2
    )
    # the consumer's materialized copy of version N is the PINNED read
    # of v1 (not the in-memory frame that produced it) — the identity
    # the oracle certifies covers the storage round-trip on both inputs
    base = read_versioned(spark, root, "orders_curated", version=1)
    merged = apply_changelog(
        base, changelog, key="o_orderkey", compare=["price"]
    )
    return merged.orderBy("o_orderkey")
