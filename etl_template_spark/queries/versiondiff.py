"""Dataset-version diff (round 6): the changelog between two pinned
versions of a versioned dataset — added / removed / changed rows.

This closes the audit loop on the engine's versioned-sink story (the
reference's whole domain is versioned pipeline outputs: R3/R4 pinned
reads, R6/R7 versioned writes — tools.go:300-366): once every refresh
commits an immutable version, "what changed between refresh N and N+1"
is the question auditors and incremental consumers ask first.  At
100 TB the diff is one sort-merge full-outer equi-join on the dataset
key — both sides shuffle-partition on the same key, no broadcast, and
bucketed writes (bucketing.py) would make it exchange-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import diff_versions, load_table, process_scratch_root, write_versioned
from ..registry import register

# v1/v2 membership + mutation rules, stated once and mirrored in SQL:
# v1 = orders with o_orderkey % 4 != 0 at the original price
# v2 = orders with o_orderkey % 3 != 0, price uplifted 10% where
#      o_orderkey % 5 == 0 (one IEEE double multiply — deterministic)
_V1_PRED = "o_orderkey % 4 != 0"
_V2_PRED = "o_orderkey % 3 != 0"
_UPLIFT_PRED = "o_orderkey % 5 = 0"


@register(
    "q_version_diff",
    oracle=f"""
    WITH v1 AS (
      SELECT o_orderkey, o_totalprice AS price
      FROM orders WHERE {_V1_PRED}),
    v2 AS (
      SELECT o_orderkey,
             CASE WHEN {_UPLIFT_PRED} THEN o_totalprice * 1.1
                  ELSE o_totalprice END AS price
      FROM orders WHERE {_V2_PRED})
    SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
           CASE WHEN v1.o_orderkey IS NULL THEN 'added'
                WHEN v2.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change,
           v1.price AS price_v1,
           v2.price AS price_v2
    FROM v1 FULL OUTER JOIN v2 USING (o_orderkey)
    WHERE v1.o_orderkey IS NULL OR v2.o_orderkey IS NULL
          OR v1.price <> v2.price
    ORDER BY o_orderkey
    """,
    tags=("etl", "versioned", "audit"),
)
def q_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog between two pinned versions of a versioned dataset:
    v1 and v2 of an ``orders_curated`` step are committed through the
    real versioned-sink path (atomic claim, immutable directories), read
    back PINNED (R4 semantics — the diff is reproducible forever, not
    'latest vs latest'), and full-outer-joined on the dataset key:

        added    in v2 only          removed  in v1 only
        changed  in both, price differs      (unchanged rows drop out)

    Plan shape at scale: one sort-merge full-outer equi-join on the
    key — both versions shuffle on o_orderkey; with bucketed versions
    (bucketing.py) the exchange disappears entirely (asserted in
    tests/test_bucketing.py::test_bucketed_version_diff_full_outer_has_no_shuffle).
    The oracle
    restates the v1/v2 membership + mutation rules over the source
    table, so a hash match proves write -> claim -> pinned read -> diff
    is lossless end-to-end."""
    # per-(sf_dir, process) scratch, wiped per build, dead siblings swept
    # (io.process_scratch_root — shared with q_recluster_zorder)
    root = process_scratch_root("etl_vdiff", sf_dir)
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

    # the reusable library API (io.diff_versions) does the pinned reads,
    # the sort-merge full-outer join, and the change classification
    return (
        diff_versions(
            spark, root, "orders_curated", key="o_orderkey", v_old=1, v_new=2
        )
        .select(
            "o_orderkey",
            "change",
            F.col("price_old").alias("price_v1"),
            F.col("price_new").alias("price_v2"),
        )
        .orderBy("o_orderkey")
    )
