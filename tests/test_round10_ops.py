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
    equi-joins — no nested-loop fallback, no cartesian."""
    p = plan_of(spark, SF, "q_tpch_q5")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert p.count("LeftSemi") >= 2, p
    # the cycle edge is part of the supplier join's composite equi-key
    assert "BroadcastHashJoin" in p or "SortMergeJoin" in p
