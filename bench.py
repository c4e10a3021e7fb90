#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes end-to-end with the noop sink (full plan execution,
rows materialized through WholeStageCodegen, nothing shipped to the
driver) — the honest cost of the query, not of collect().
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

HEADLINE = [
    "q_agg_group",       # TPC-H Q1 shape: the batch spine
    "q_join_multi",      # 5-table star join + agg
    "q_filter",          # pushdown-heavy scan
    "q_win_rank",        # window shuffle
    "q_topk_per_group",  # rank-limit pushdown
    "q_sort_limit",      # TakeOrderedAndProject
    "q_dedup_fuzzy",     # MinHash LSH end-to-end
    "q_dedup_exact",     # hash-aggregate dedup
    "q_sim_search",      # vector top-k
    "q_tfidf",           # token explode + joins + window
    "q_stream_tumbling", # event-time windowing
    "q_sessionize",      # lag+cumsum sessionization
    "q_join_promo_share",# fact-dim join + conditional agg (TPC-H Q14 shape)
    "q_tpch_q3",         # 3-way join + grouped top-k (TPC-H Q3 shape)
    "q_tpch_q18",        # aggregate semi-join (TPC-H Q18 shape)
    "q_dedup_ngram",     # inverted-index jaccard
    "q_sim_search_ivf",  # IVF ANN probe
    "q_agg_percentile",  # exact percentiles per group
    "q_tpch_q6",         # pure scan-bound aggregate (TPC-H Q6)
    "q_tpch_q8",         # 7-table broadcast star (TPC-H Q8)
    "q_tpch_q21",        # per-order EXISTS/NOT-EXISTS collapse (TPC-H Q21)
    "q_join_range",      # binned big×big range join (no equi key)
    "q_events_funnel",   # ordered funnel (stage-conditioned aggregates)
    "q_corpus_curation", # composed dedup+quality curation verdict
    "q_sim_search_pq",   # product-quantization ANN (code scan + rerank)
]


def _steal_seconds() -> float | None:
    """Cumulative CPU-steal seconds across all cores (/proc/stat field 8,
    USER_HZ ticks).  Deltas around a bench pass attribute slow passes to
    the HOST (hypervisor stealing cycles) instead of the plan — turning
    'this round is +20%, probably noise' into recorded data."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8]) / os.sysconf("SC_CLK_TCK")
    except Exception:
        return None


def _prelaunch_conditions(sample_sec: float = 1.5) -> dict:
    """Host conditions sampled BEFORE the session spins up: loadavg
    (1/5/15 min) and an idle CPU-steal rate over ``sample_sec``.
    Recorded into the BENCH_DETAIL sidecar so every pass — including
    the driver's official one — carries its own contention
    attribution (r11 VERDICT: steal ticks measured DURING a run
    undercount co-tenant memory-bandwidth/LLC pressure, and quiet
    IDLE windows don't predict quiet RUNS, so the quiet-column
    protocol needs both the pre-launch picture and the in-run steal
    to attribute a hot pass).  Best-effort: absent /proc (non-Linux)
    yields nulls, never a crash — the official datum must not be
    lost to an attribution probe."""
    out: dict = {"loadavg": None, "idle_steal_rate": None,
                 "sample_sec": sample_sec}
    try:
        # AttributeError too (r12 review): os.getloadavg does not
        # EXIST on Windows — only catching OSError would crash main()
        # before any query ran, the exact datum-loss this function's
        # contract forbids.
        out["loadavg"] = [round(x, 2) for x in os.getloadavg()]
    except (OSError, AttributeError):
        pass
    s0 = _steal_seconds()
    if s0 is not None and sample_sec > 0:
        time.sleep(sample_sec)
        s1 = _steal_seconds()
        if s1 is not None:
            # clamp at 0 (r12 ADVICE): a steal-counter reset between
            # samples (VM migration/suspend) would otherwise record a
            # negative rate for a run where nothing is wrong — the
            # probe's contract is best-effort attribution, and a
            # regressed counter carries no signal beyond "quiet".
            out["idle_steal_rate"] = round(max(0.0, (s1 - s0) / sample_sec), 4)
    return out


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    prelaunch = _prelaunch_conditions()
    # one leading number only, and never a crash (r10 review): the old
    # greedy [0-9.]+ captured 'sf0.1.bak' as '0.1.' and float() raised
    # BEFORE any query ran — losing the round's official perf datum to
    # a directory rename, the r05 failure mode these guards exist for
    m = re.search(r"sf([0-9]+(?:\.[0-9]+)?)", os.path.basename(os.path.normpath(sf_dir)))
    sf = float(m.group(1)) if m else -1.0

    from etl_template_spark.caching import release_tracked
    from etl_template_spark.session import get_spark
    from etl_template_spark.queries import REGISTRY

    spark = get_spark(app_name="bench")
    # warm the JVM/codegen once with the flagship so per-query numbers
    # measure the plan, not first-touch classloading
    REGISTRY["q_agg_group"].build(spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()

    # Three passes per query, keep the MEDIAN: this VM sees multi-second
    # CPU steal bursts from the host (observed 10-100x spreads on
    # identical plans).  min-of-2 rejected a single burst but made
    # round-over-round regression flags unactionable (±15-30% swings on
    # 1-3 s queries); the median tolerates one burst pass AND one
    # suspiciously-fast pass, so a >1.5x median move is a real
    # regression.  clearCache between passes so internally-persisted
    # frames (fuzzy/ngram dedup) never distort a later pass's memory
    # budget.
    #
    # Protocol note (r3→r4 comparability): release_tracked/clearCache
    # per pass landed in r4.  Before that, builder-persisted frames
    # (e.g. q_sim_search_pq's subvectors+codebooks) stayed warm across
    # passes, so r3 recorded a warm-cache rebuild for such queries;
    # r4+ records the honest cold cost.  The PQ 1.73→2.4 s step between
    # those rounds is this measurement change, not a plan regression —
    # confirmed on a near-zero-steal host with three consistent cold
    # passes (see steal/pass_detail fields below).
    timings: dict[str, float] = {}
    pass_detail: dict[str, dict[str, list[float]]] = {}
    run_steal0 = _steal_seconds()
    for name in HEADLINE:
        q = REGISTRY[name]
        passes: list[float] = []
        steals: list[float] = []
        for _ in range(3):
            s0 = _steal_seconds()
            t0 = time.perf_counter()
            q.build(spark, sf_dir).write.mode("overwrite").format("noop").save()
            passes.append(time.perf_counter() - t0)
            s1 = _steal_seconds()
            steals.append(
                round(s1 - s0, 3) if s0 is not None and s1 is not None else -1.0
            )
            release_tracked()  # drop builder-persisted intermediates
            spark.catalog.clearCache()
        timings[name] = round(sorted(passes)[1], 3)
        pass_detail[name] = {
            "passes": [round(p, 3) for p in passes],
            "steal": steals,
        }

    run_steal1 = _steal_seconds()
    total = round(sum(timings.values()), 3)
    steal_sec = (
        round(run_steal1 - run_steal0, 3)
        if run_steal0 is not None and run_steal1 is not None
        else None
    )
    # Per-pass timings + steal go to a SIDECAR file, not stdout: round 5
    # embedded them in the stdout JSON line and the line outgrew the
    # driver's tail-capture window (BENCH_r05.json parsed:null — the
    # round recorded no official perf number).  The driver parses the
    # LAST stdout line, so that line must stay the compact ~600-byte
    # headline shape that parsed in rounds 1-4.
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    try:
        with open(detail_path, "w") as f:
            json.dump(
                {
                    "sf": sf,
                    "steal_sec": steal_sec,
                    "prelaunch": prelaunch,
                    "pass_detail": pass_detail,
                },
                f,
                indent=1,
            )
    except OSError as e:
        print(f"bench: could not write {detail_path}: {e}", file=sys.stderr)

    print(headline_line(total, timings, sf, steal_sec))
    return 0


def headline_line(
    total: float, timings: dict[str, float], sf: float, steal_sec: float | None
) -> str:
    """The driver-parsed final stdout line.  MUST stay compact (the
    driver tail-captures stdout; round 5 proved an oversized line is
    silently dropped) — test_bench_headline_line_is_bounded pins this."""
    return json.dumps(
        {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "steal_sec": steal_sec,
        }
    )


if __name__ == "__main__":
    sys.exit(main())
