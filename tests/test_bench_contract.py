"""Guards for the bench harness's driver contract.

Round 5 lesson: the driver tail-captures stdout and parses the LAST
line as the official per-round perf datum.  Embedding per-pass detail
in that line made it exceed the capture window and the round recorded
no number (BENCH_r05.json parsed:null).  These tests pin the headline
line to a bounded, parseable shape without running the (expensive)
bench itself.
"""

from __future__ import annotations

import json

import bench


def test_bench_headline_line_is_bounded():
    # Worst-case realistic payload: every headline query with a 4-digit
    # seconds value.  The line must stay far below any plausible
    # tail-capture window (r4's ~600-byte line parsed; give 4x slack).
    timings = {name: 9999.999 for name in bench.HEADLINE}
    line = bench.headline_line(99999.999, timings, 0.1, 12.345)
    assert len(line) < 2400, f"headline line too long: {len(line)} bytes"
    assert "\n" not in line


def test_bench_headline_names_are_registered():
    """Every HEADLINE name must exist in the query registry (r10
    review): a typo'd or renamed entry would otherwise raise KeyError
    at bench time — on the driver's official pass — and the round would
    record no perf datum at all (the BENCH_r05 failure mode)."""
    from etl_template_spark.queries import REGISTRY

    missing = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert not missing, f"HEADLINE names not in REGISTRY: {missing}"


def test_bench_headline_line_parses_with_required_keys():
    timings = {name: 1.0 for name in bench.HEADLINE}
    obj = json.loads(bench.headline_line(25.0, timings, 0.1, None))
    assert obj["metric"] == "headline_queries_total"
    assert obj["value"] == 25.0
    assert obj["unit"] == "sec"
    assert obj["sf"] == 0.1
    assert set(obj["queries"]) == set(bench.HEADLINE)
    # pass_detail must NOT be on the parsed line — it lives in the
    # BENCH_DETAIL.json sidecar.
    assert "pass_detail" not in obj
