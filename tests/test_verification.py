"""Unit tests for the content-hash stamp bookkeeping's git comparison
policy (etl_template_spark/verification.py::_modules_clean_vs_head).

The fail-safe contract: a stamp may only certify content the driver
actually executed, so any ambiguity about whether a module still equals
git HEAD must resolve to NOT-clean (skip the stamp, re-record the
query) — never to clean.
"""

from __future__ import annotations

import subprocess
from types import SimpleNamespace

from etl_template_spark import verification


def _fake_run(rc_for_diff):
    """subprocess.run stand-in: HEAD rev-parse succeeds; per-path
    `git diff --quiet` returns rc_for_diff."""

    def run(cmd, **kwargs):
        rc = 0 if "rev-parse" in cmd else rc_for_diff
        return SimpleNamespace(returncode=rc, stdout=b"", stderr=b"")

    return run


def test_clean_path_rc0_is_clean(monkeypatch):
    monkeypatch.setattr(subprocess, "run", _fake_run(0))
    assert verification._modules_clean_vs_head("/r", {"/r/a.py"}) == {"/r/a.py"}


def test_dirty_path_rc1_is_not_clean(monkeypatch):
    monkeypatch.setattr(subprocess, "run", _fake_run(1))
    assert verification._modules_clean_vs_head("/r", {"/r/a.py"}) == set()


def test_git_failure_rc128_is_not_clean(monkeypatch):
    """r5 ADVICE: a per-path git FAILURE (exit >= 2, e.g. dubious
    ownership) must not stamp the module clean — an edited module would
    otherwise keep a stale content-hash stamp."""
    monkeypatch.setattr(subprocess, "run", _fake_run(128))
    assert verification._modules_clean_vs_head("/r", {"/r/a.py"}) == set()


def test_unresolvable_head_trusts_round_start_discipline(monkeypatch):
    """No resolvable HEAD (fresh clone, no repo): comparison is
    impossible for EVERY path, so the round-start discipline is the only
    guard and all paths pass through."""

    def run(cmd, **kwargs):
        return SimpleNamespace(returncode=128, stdout=b"", stderr=b"")

    # rev-parse fails -> head_ok False -> everything treated clean
    monkeypatch.setattr(subprocess, "run", run)
    assert verification._modules_clean_vs_head("/r", {"/r/a.py"}) == {"/r/a.py"}


def test_per_path_timeout_is_not_clean(monkeypatch):
    """A per-path subprocess FAILURE (timeout under a CPU-steal burst)
    after a successful HEAD check must resolve to NOT-clean — the same
    fail-safe as rc >= 2 (an edited module must never keep its stamp
    because git stalled)."""

    def run(cmd, **kwargs):
        if "rev-parse" in cmd:
            return SimpleNamespace(returncode=0, stdout=b"", stderr=b"")
        raise subprocess.TimeoutExpired(cmd=cmd, timeout=30)

    monkeypatch.setattr(subprocess, "run", run)
    assert verification._modules_clean_vs_head("/r", {"/r/a.py"}) == set()
