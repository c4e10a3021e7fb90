"""ANN quality tests: the approximate searches (LSH, IVF) are checked
rows-only by the harness, so the recall-vs-exact and candidate-exactness
guarantees live here."""

from __future__ import annotations

import pytest

from etl_template_spark.queries import REGISTRY


@pytest.fixture(scope="module")
def results(spark, sf_dir):
    out = {}
    for name in ("q_sim_search", "q_sim_search_lsh", "q_sim_search_ivf", "q_sim_search_pq"):
        out[name] = REGISTRY[name].build(spark, sf_dir).collect()
    return out


def test_ivf_recall(results):
    exact = [r["vec_id"] for r in results["q_sim_search"]]
    ivf = [r["vec_id"] for r in results["q_sim_search_ivf"]]
    assert len(set(exact) & set(ivf)) / len(exact) >= 0.6


def test_lsh_recall_floor(results):
    # sign-LSH at mid-similarity regimes is the weak case (see docstring);
    # the floor asserts the multiprobe keeps it far from random
    exact = [r["vec_id"] for r in results["q_sim_search"]]
    lsh = [r["vec_id"] for r in results["q_sim_search_lsh"]]
    assert len(set(exact) & set(lsh)) / len(exact) >= 0.2


def test_candidates_are_exactly_scored(results):
    """Approximation may MISS neighbors but must never mis-score one:
    every returned (vec_id, cos_sim) must equal the exact computation."""
    exact_by_id = {r["vec_id"]: r["cos_sim"] for r in results["q_sim_search"]}
    for name in ("q_sim_search_lsh", "q_sim_search_ivf", "q_sim_search_pq"):
        for r in results[name]:
            if r["vec_id"] in exact_by_id:
                assert r["cos_sim"] == exact_by_id[r["vec_id"]], (name, r)


def test_ann_results_sorted_and_bounded(results):
    for name, rows in results.items():
        sims = [r["cos_sim"] for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert len(rows) <= 10
        assert all(-1.0 <= s <= 1.0 for s in sims)


def test_pq_recall(results):
    """PQ with an exact-rerank pool: recall@10 vs the exact baseline.
    The ADC approximation only has to land true neighbors inside the
    top-_PQ_RERANK pool; the rerank restores exact order within it."""
    exact = [r["vec_id"] for r in results["q_sim_search"]]
    pq = [r["vec_id"] for r in results["q_sim_search_pq"]]
    assert len(set(exact) & set(pq)) / len(exact) >= 0.6
