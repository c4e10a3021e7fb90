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


def test_bench_prelaunch_conditions_shape():
    """r11 VERDICT / r12: every bench pass records pre-launch host
    conditions (loadavg + idle steal rate) into the sidecar so hot
    official passes self-attribute.  The probe must be best-effort —
    JSON-serializable whatever the platform yields — and must never
    be able to crash the bench (the official datum outranks the
    attribution)."""
    cond = bench._prelaunch_conditions(sample_sec=0.1)
    assert set(cond) == {"loadavg", "idle_steal_rate", "sample_sec"}
    json.dumps(cond)  # sidecar-serializable
    if cond["loadavg"] is not None:  # Linux/macOS
        assert len(cond["loadavg"]) == 3
    if cond["idle_steal_rate"] is not None:  # Linux /proc
        assert cond["idle_steal_rate"] >= 0.0
    # prelaunch stays OFF the driver-parsed stdout line
    line = bench.headline_line(25.0, {n: 1.0 for n in bench.HEADLINE}, 0.1, 0.5)
    assert "prelaunch" not in line


def test_bench_prelaunch_steal_counter_regression_clamped(monkeypatch):
    """r12 ADVICE (low): a steal-counter reset between the two samples
    (VM migration/suspend) makes s1 < s0; the sidecar must record 0.0
    — not a negative rate that reads as a broken probe on a run where
    nothing is actually wrong."""
    vals = iter([100.0, 50.0])
    monkeypatch.setattr(bench, "_steal_seconds", lambda: next(vals))
    cond = bench._prelaunch_conditions(sample_sec=0.01)
    assert cond["idle_steal_rate"] == 0.0
