"""Edge-case tests for the round-10 query: TPC-H Q5's cyclic join.

The sf-fixture differential proves the numbers; these prove the two
things the fixture can't isolate:

- the CYCLE is the semantics — revenue counts only when the ordering
  customer and the line's supplier sit in the SAME nation, not merely
  when both sit in the region (a star-shaped Q5-alike would pass the
  fixture on the wrong join graph if the fixture happened to be
  cycle-degenerate);
- the PLAN carries both region prunes — supplier AND customer are each
  semi-join-pruned by the broadcast 5-nation frame before the fact
  join, and the cycle edge rides an equi-join (no nested-loop, no
  cartesian).  Catalyst cannot infer the customer prune from the cycle
  (the implication crosses a join), so only a plan pin keeps a
  refactor from silently dropping it.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from etl_template_spark.queries import REGISTRY

from test_plans import plan_of

SF = "/root/testdata/sf0.001"


def _write_micro_world(spark, root) -> str:
    """A 6-table world distilled to one row per Q5 branch:

    - (o1, s_jp):  customer JAPAN, supplier JAPAN   -> counts (JAPAN)
    - (o2, s_in):  customer JAPAN, supplier INDIA   -> cycle broken, dropped
    - (o3, s_in):  customer INDIA, supplier INDIA   -> counts (INDIA)
    - (o4, s_br):  customer+supplier BRAZIL         -> not ASIA, dropped
    - (o5, s_jp):  same-nation pair, 1995 order     -> date window, dropped
    """
    d = str(root)

    def w(name, schema, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{d}/{name}.parquet"
        )

    w("region", "r_regionkey long, r_name string", [(0, "ASIA"), (1, "AMERICA")])
    w(
        "nation",
        "n_nationkey long, n_name string, n_regionkey long",
        [(0, "JAPAN", 0), (1, "INDIA", 0), (2, "BRAZIL", 1)],
    )
    w(
        "customer",
        "c_custkey long, c_nationkey long",
        [(1, 0), (2, 1), (3, 2)],
    )
    w(
        "supplier",
        "s_suppkey long, s_nationkey long",
        [(10, 0), (11, 1), (12, 2)],
    )
    ts = datetime.datetime
    w(
        "orders",
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
        [
            (1, 1, ts(1996, 6, 1)),
            (2, 1, ts(1996, 6, 2)),
            (3, 2, ts(1996, 6, 3)),
            (4, 3, ts(1996, 6, 4)),
            (5, 1, ts(1995, 1, 1)),
        ],
    )
    w(
        "lineitem",
        "l_orderkey long, l_suppkey long, l_extendedprice double, l_discount double",
        [
            (1, 10, 100.0, 0.0),
            (2, 11, 100.0, 0.0),
            (3, 11, 200.0, 0.5),
            (4, 12, 100.0, 0.0),
            (5, 10, 100.0, 0.0),
        ],
    )
    return d


def test_tpch_q5_cycle_edge_is_the_semantics(spark, tmp_path):
    """o2 pairs an ASIA customer with an ASIA supplier from a DIFFERENT
    nation: a star-shaped (region-only) Q5 would count it; the cyclic
    join must drop it.  INDIA and JAPAN tie at 100.0, exercising the
    n_name tiebreak of the ORDER BY as a bonus."""
    d = _write_micro_world(spark, tmp_path)
    rows = [tuple(r) for r in REGISTRY["q_tpch_q5"].build(spark, d).collect()]
    assert rows == [("INDIA", 100.0, 1), ("JAPAN", 100.0, 1)]


def test_tpch_q5_plan_prunes_both_dimension_chains(spark):
    """Both ASIA semi-join prunes (supplier AND customer) must survive
    into the physical plan, and the cycle edge must ride hash
    equi-joins — no nested-loop fallback, no cartesian.

    The semi-join count uses the TREE string, where each node prints
    once (r10 mutation pass: the formatted explain prints every node
    twice — tree + details — so `formatted.count("LeftSemi") >= 2` was
    satisfied by the supplier prune alone and did not notice the
    customer prune deleted)."""
    p = plan_of(spark, SF, "q_tpch_q5")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    tree = (
        REGISTRY["q_tpch_q5"]
        .build(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert tree.count("LeftSemi") >= 2, tree
    # the cycle edge is part of the supplier join's composite equi-key
    assert "BroadcastHashJoin" in p or "SortMergeJoin" in p


# ----------------------------------------------------------------------
# r10 self-review fixes (library-side; see the round-10 SURVEY paragraph)
# ----------------------------------------------------------------------


def test_with_salt_fans_out_identical_rows(spark):
    """The canonical hot-key shape is byte-identical rows (a bare key
    column feeding a count): a pure row-content hash maps them all to
    ONE salt, silently defeating the salting.  The partition-id mix-in
    must fan them across salts, while staying deterministic run-to-run
    (retry idempotence)."""
    from etl_template_spark.operators.skew import salted_agg, with_salt

    df = spark.createDataFrame(
        [("hot",)] * 400, "k string"
    ).repartition(8)
    salts = {
        r["__salt"] for r in with_salt(df, n_salts=16).select("__salt").collect()
    }
    assert len(salts) > 1, "identical rows all landed on one salt"
    # determinism: the same plan re-executed yields the same salt set
    salts2 = {
        r["__salt"] for r in with_salt(df, n_salts=16).select("__salt").collect()
    }
    assert salts == salts2
    # and the two-phase aggregate is still exact
    out = salted_agg(
        df, ["k"], {"n": (F.count(F.lit(1)), F.sum("n"))}, n_salts=16
    ).collect()
    assert [(r["k"], r["n"]) for r in out] == [("hot", 400)]


def test_replicate_join_rejects_right_preserving_how(spark):
    """right/full outer would surface each unmatched right row once per
    salt (n_salts duplicates) — rejected loudly; the left-preserving
    hows stay exact vs the plain join."""
    import pytest

    from etl_template_spark.operators.skew import replicate_join

    left = spark.createDataFrame(
        [("a", 1), ("a", 2), ("c", 3)], "k string, x int"
    )
    right = spark.createDataFrame(
        [("a", "A"), ("b", "B")], "k string, label string"
    )
    for bad in ("right", "full", "full_outer", "cross"):
        with pytest.raises(ValueError, match="left-side-preserving"):
            replicate_join(left, right, on="k", how=bad)
    for how in ("left", "left_semi", "left_anti"):
        got = replicate_join(left, right, on="k", n_salts=4, how=how)
        want = left.join(right, "k", how)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), how


def test_asof_join_rejects_left_column_collision(spark):
    """A carried value column that already exists on the left frame
    used to be silently overwritten; it must raise the way a plain
    join surfaces ambiguity."""
    import datetime

    import pytest

    from etl_template_spark.operators.asof import asof_join

    ts = datetime.datetime
    left = spark.createDataFrame(
        [("k1", ts(2024, 1, 2), 99.0)], "k string, t timestamp, v double"
    )
    right = spark.createDataFrame(
        [("k1", ts(2024, 1, 1), 1.0)], "k string, rt timestamp, v double"
    )
    with pytest.raises(ValueError, match="value_cols.*left"):
        asof_join(left, right, "k", "k", "t", "rt", value_cols=["v"])
    # aliased, the same join works and the left column is intact
    ok = asof_join(
        left,
        right.withColumnRenamed("v", "quote_v"),
        "k",
        "k",
        "t",
        "rt",
        value_cols=["quote_v"],
    ).collect()
    assert [(r["v"], r["quote_v"]) for r in ok] == [(99.0, 1.0)]


def test_compact_versioned_preserves_partition_layout(spark, tmp_path):
    """Compacting a hive-partitioned version must keep the partition
    directories (and thus partition pruning) in the new version —
    flattening them silently turns every pruned scan downstream into a
    full scan."""
    import os

    from etl_template_spark.io import (
        compact_versioned,
        latest_version,
        read_versioned,
        write_versioned,
    )

    root = str(tmp_path)
    df = spark.createDataFrame(
        [("2024-01-01", i, f"r{i}") for i in range(20)]
        + [("2024-01-02", i, f"s{i}") for i in range(20)],
        "event_date string, id long, payload string",
    ).repartition(8)  # many small files per partition dir
    write_versioned(df, root, "ev", partition_by=["event_date"])

    compact_versioned(spark, root, "ev", sort_by=["id"])
    v = latest_version(root, "ev")
    vdir = os.path.join(root, "ev", f"v={v}")
    part_dirs = sorted(
        e for e in os.listdir(vdir) if e.startswith("event_date=")
    )
    assert part_dirs == ["event_date=2024-01-01", "event_date=2024-01-02"]
    back = read_versioned(spark, root, "ev")
    assert back.count() == 40
    assert set(back.columns) == {"event_date", "id", "payload"}
    # explicit partition_by=[] opts OUT of preservation
    compact_versioned(spark, root, "ev", partition_by=[])
    v2 = latest_version(root, "ev")
    v2dir = os.path.join(root, "ev", f"v={v2}")
    assert not any(e.startswith("event_date=") for e in os.listdir(v2dir))
    assert read_versioned(spark, root, "ev").count() == 40


def test_zorder_ranks_nulls_low_not_max(spark):
    """r10 review: a NULL in a z-order column used to ride through
    F.least (which skips null operands) and rank at the keyspace
    MAXIMUM, silently scattering nulls through the top row groups.
    They must rank at the low corner instead — and non-null ranks are
    unchanged by the fix."""
    from etl_template_spark.layout import Z_COL, with_zorder

    df = spark.createDataFrame(
        [(0.0, 0.0), (100.0, 100.0), (None, 0.0)], "a double, b double"
    )
    rows = {
        (r["a"], r["b"]): r[Z_COL]
        for r in with_zorder(df, ["a", "b"], bits=8).collect()
    }
    z_min, z_max, z_null = (
        rows[(0.0, 0.0)],
        rows[(100.0, 100.0)],
        rows[(None, 0.0)],
    )
    assert z_null == z_min  # null ranks with the minimum corner
    assert z_max > z_null
