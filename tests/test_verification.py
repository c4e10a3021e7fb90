"""Unit tests for the content-hash stamp bookkeeping's git comparison
policy (verification.py::_recording_anchor / _modules_match_recording).

The fail-safe contract: a stamp may only certify content the driver
actually EXECUTED.  The executed tree is anchored by the commit that
added that round's ``CORRECTNESS_r{N}.json`` (the driver records on the
final round tree and the bookkeeping commit lands immediately after),
so a pending module is stamped only when its current bytes equal its
bytes at that anchor.  Any ambiguity — no anchor commit, git failure,
unreadable file, timeout — must resolve to NOT-matching (skip the
stamp, re-record the query), never to matching.
"""

from __future__ import annotations

import subprocess
from types import SimpleNamespace

from etl_template_spark import verification

_SHA = b"a" * 40 + b"\n"


def _fake_run(anchor_rc=0, show_rc=0, show_out=b"body", head_rc=0):
    """subprocess.run stand-in: `git rev-parse HEAD` returns
    ``head_rc``; `git log --diff-filter=A` returns the anchor sha with
    ``anchor_rc``; `git show anchor:path` returns ``show_out`` with
    ``show_rc``."""

    def run(cmd, **kwargs):
        if "rev-parse" in cmd:
            return SimpleNamespace(returncode=head_rc, stdout=b"", stderr=b"")
        if "log" in cmd:
            return SimpleNamespace(
                returncode=anchor_rc,
                stdout=_SHA if anchor_rc == 0 else b"",
                stderr=b"",
            )
        return SimpleNamespace(returncode=show_rc, stdout=show_out, stderr=b"")

    return run


def test_anchor_resolves_to_adding_commit(monkeypatch):
    monkeypatch.setattr(subprocess, "run", _fake_run())
    assert verification._recording_anchor("/r", 9) == "a" * 40


def test_anchor_git_failure_is_none(monkeypatch):
    monkeypatch.setattr(subprocess, "run", _fake_run(anchor_rc=128))
    assert verification._recording_anchor("/r", 9) is None


def test_anchor_empty_output_is_none(monkeypatch):
    """`git log --diff-filter=A` exits 0 with NO output when the
    CORRECTNESS file was never committed (e.g. the bookkeeping commit
    has not landed yet) — that is 'no anchor', not 'anchor ""'."""

    def run(cmd, **kwargs):
        return SimpleNamespace(returncode=0, stdout=b"", stderr=b"")

    monkeypatch.setattr(subprocess, "run", run)
    assert verification._recording_anchor("/r", 9) is None


def test_matching_bytes_stamp(monkeypatch, tmp_path):
    p = tmp_path / "a.py"
    p.write_bytes(b"body")
    monkeypatch.setattr(subprocess, "run", _fake_run(show_out=b"body"))
    got = verification._modules_match_recording(str(tmp_path), 9, {str(p)})
    assert got == {str(p)}


def test_drifted_bytes_do_not_stamp(monkeypatch, tmp_path):
    """The r10 review hole: a module edited (and even committed) after
    the recording must NOT be stamped — current bytes differ from the
    anchor's bytes even though they may equal current HEAD."""
    p = tmp_path / "a.py"
    p.write_bytes(b"edited body")
    monkeypatch.setattr(subprocess, "run", _fake_run(show_out=b"body"))
    assert verification._modules_match_recording(str(tmp_path), 9, {str(p)}) == set()


def test_no_anchor_means_nothing_matches(monkeypatch, tmp_path):
    p = tmp_path / "a.py"
    p.write_bytes(b"body")
    monkeypatch.setattr(subprocess, "run", _fake_run(anchor_rc=128))
    assert verification._modules_match_recording(str(tmp_path), 9, {str(p)}) == set()


def test_per_path_show_failure_is_not_matching(monkeypatch, tmp_path):
    """git show failing for one path (rc 128: path not in the anchor
    tree) skips that path's stamp only."""
    p = tmp_path / "a.py"
    p.write_bytes(b"body")
    monkeypatch.setattr(subprocess, "run", _fake_run(show_rc=128))
    assert verification._modules_match_recording(str(tmp_path), 9, {str(p)}) == set()


def test_per_path_timeout_is_not_matching(monkeypatch, tmp_path):
    """A per-path subprocess TIMEOUT (CPU-steal burst) after a
    successful anchor resolution must resolve to NOT-matching — an
    edited module must never keep its stamp because git stalled."""
    p = tmp_path / "a.py"
    p.write_bytes(b"body")

    def run(cmd, **kwargs):
        if "rev-parse" in cmd:
            return SimpleNamespace(returncode=0, stdout=b"", stderr=b"")
        if "log" in cmd:
            return SimpleNamespace(returncode=0, stdout=_SHA, stderr=b"")
        raise subprocess.TimeoutExpired(cmd=cmd, timeout=30)

    monkeypatch.setattr(subprocess, "run", run)
    assert verification._modules_match_recording(str(tmp_path), 9, {str(p)}) == set()


def test_unreadable_file_is_not_matching(monkeypatch, tmp_path):
    p = tmp_path / "missing.py"  # never written
    monkeypatch.setattr(subprocess, "run", _fake_run(show_out=b"body"))
    assert verification._modules_match_recording(str(tmp_path), 9, {str(p)}) == set()


def test_gitless_root_trusts_round_start_discipline(monkeypatch, tmp_path):
    """No resolvable HEAD (fresh clone, bare tmpdir): comparison is
    impossible for EVERY path, so the round-start discipline is the
    only guard and readable paths pass through — the pre-anchor escape
    the tmp-root unit flows (and nothing in production) rely on."""
    p = tmp_path / "a.py"
    p.write_bytes(b"body")
    monkeypatch.setattr(subprocess, "run", _fake_run(head_rc=128))
    got = verification._modules_match_recording(str(tmp_path), 9, {str(p), ""})
    assert got == {str(p)}


def test_empty_path_is_skipped_not_crash(monkeypatch, tmp_path):
    """inspect.getsourcefile can return None → '' reaches the matcher;
    the r10 review found relpath('') raising.  It must skip, not crash."""
    monkeypatch.setattr(subprocess, "run", _fake_run())
    assert verification._modules_match_recording(str(tmp_path), 9, {""}) == set()
