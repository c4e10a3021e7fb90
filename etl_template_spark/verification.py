"""Official-verification bookkeeping: which queries have a *currently
valid* recorded correctness row.

The driver records a bounded window (~50 entries) from the front of
``__spark_entry__.queries()`` into ``CORRECTNESS_r{N}.json`` each round.
``__spark_entry__`` rotates already-recorded queries behind that window
so never-recorded ones get their first official row.  That rotation has
a failure mode (flagged by round-3 ADVICE): a query counted as
"recorded" *by name only*, so a later semantic change to its builder or
oracle kept a stale official "pass" forever.

This module closes that hole with a content-hash snapshot:

- ``query_content_hash(name)`` hashes the query's builder source, its
  defining module's full source, and its oracle SQL.  Hashing the whole
  defining module is deliberately conservative: editing any query in a
  module invalidates its neighbours too, which at worst costs window
  slots, never correctness.  (Limitation: edits to *shared* modules —
  io.py, compat.py — are not captured per-query; the staleness rotation
  below bounds that exposure to a couple of rounds, since every recorded
  query cycles back through the window oldest-first.)
- ``QUERY_CONTENT_HASHES.json`` (repo root, committed) maps each
  officially recorded query to the hash of its content as of the round
  that recorded it.
- A recorded query whose current hash no longer matches the snapshot is
  *invalidated*: ``__spark_entry__`` promotes it back into the recording
  window ahead of the already-valid tail.
- ``refresh_snapshot()`` is run at the START of each builder round,
  before any code edits, when working-tree content still equals the
  content the just-landed CORRECTNESS round executed.  It (re)stamps
  hashes only for queries whose latest successful record round is newer
  than the stamped round, so an invalidated entry stays invalidated
  until the driver actually re-records the query.
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import re

from .registry import REGISTRY

SNAPSHOT_BASENAME = "QUERY_CONTENT_HASHES.json"


def _ensure_registry() -> None:
    """REGISTRY fills as a side effect of importing the queries package;
    make that explicit so this module works standalone."""
    if not REGISTRY:
        from . import queries  # noqa: F401


def repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def query_content_hash(name: str) -> str:
    """sha256 over (builder fn source, defining-module source, oracle)."""
    _ensure_registry()
    q = REGISTRY[name]
    mod = inspect.getmodule(q.build)
    parts = [
        inspect.getsource(q.build),
        inspect.getsource(mod) if mod is not None else "",
        q.oracle if q.oracle is not None else "<rows-only>",
    ]
    return hashlib.sha256("\0".join(parts).encode()).hexdigest()


def _correctness_rows(root: str) -> dict[int, dict]:
    """{round_number: parsed CORRECTNESS_r{N}.json} for committed rounds."""
    out: dict[int, dict] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                out[int(m.group(1))] = json.load(f)
        except Exception:
            continue
    return out


def _row_ok(row: object) -> bool:
    """A row counts as successfully recorded only when it ran to
    completion (err is null for oracle-checked, 'no_oracle' for
    rows-only by design) AND no comparison explicitly failed: a row
    with hash_match/rows_match/schema_match == false is a recorded
    FAILURE — it must re-enter the window front (the r04
    q_token_type_ratio/q_pack_sequences oracle-type bugs would
    otherwise have counted as validly recorded passes)."""
    if not isinstance(row, dict) or row.get("err") not in (None, "no_oracle"):
        return False
    return not any(
        row.get(k) is False for k in ("hash_match", "rows_match", "schema_match")
    )


def latest_recorded_round(root: str | None = None) -> dict[str, int]:
    """name -> latest round with a successful official row."""
    root = root or repo_root()
    latest: dict[str, int] = {}
    for rnd, rows in _correctness_rows(root).items():
        for name, row in rows.items():
            if _row_ok(row):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def attempted_names(root: str | None = None) -> frozenset[str]:
    """Every name appearing in any official row, successful or not."""
    root = root or repo_root()
    seen: set[str] = set()
    for rows in _correctness_rows(root).values():
        seen.update(rows)
    return frozenset(seen)


def load_snapshot(root: str | None = None) -> dict[str, dict]:
    path = os.path.join(root or repo_root(), SNAPSHOT_BASENAME)
    try:
        with open(path) as f:
            snap = json.load(f)
        return snap if isinstance(snap, dict) else {}
    except Exception:
        return {}


def invalidated_names(root: str | None = None) -> frozenset[str]:
    """Recorded queries whose current content is not certified by the
    snapshot: the stamped hash differs, OR no stamp exists at all.

    Missing-stamp-means-invalid is the fail-safe direction: a recorded
    query that never got stamped (refresh skipped, snapshot lost) is
    promoted back into the recording window and re-recorded — at worst
    a wasted window slot, never a stale pass certifying changed code.
    """
    root = root or repo_root()
    _ensure_registry()
    recorded = latest_recorded_round(root)
    snap = load_snapshot(root)
    out = set()
    for name in recorded:
        if name not in REGISTRY:
            continue
        entry = snap.get(name)
        if entry is None or entry.get("hash") != query_content_hash(name):
            out.add(name)
    return frozenset(out)


def _recording_anchor(root: str, rnd: int) -> str | None:
    """The commit whose tree the round-``rnd`` recording executed: the
    commit that ADDED ``CORRECTNESS_r{rnd:02d}.json`` (the driver
    records on the final round tree and the bookkeeping commit lands
    immediately after, before any other edit under the round-start
    discipline).  None when git cannot resolve it — unresolvable
    anchors follow the repo-wide ambiguity policy: NOT clean, skip the
    stamp."""
    import subprocess

    try:
        proc = subprocess.run(
            [
                "git", "-C", root, "log", "--diff-filter=A",
                "--format=%H", "-n", "1", "--",
                f"CORRECTNESS_r{rnd:02d}.json",
            ],
            capture_output=True,
            timeout=30,
        )
    except Exception:
        return None
    if proc.returncode != 0:
        return None
    sha = proc.stdout.decode().strip()
    return sha or None


def _modules_match_recording(root: str, rnd: int, paths: set[str]) -> set[str]:
    """Subset of ``paths`` whose CURRENT bytes equal their bytes at the
    round-``rnd`` recording anchor (r10 review: the old HEAD comparison
    certified content the driver never executed whenever the builder
    edited AND COMMITTED a pending query module before the round's
    first pytest run — current HEAD then contained the edit, the diff
    was 'clean', and the stale recording got a fresh stamp).  Every
    ambiguity (no anchor commit, git failure, unreadable file) resolves
    to NOT matching: the stamp is skipped and the query re-records — a
    wasted window slot at worst, never a stale pass.

    One deliberate exception, carried over from the pre-anchor policy:
    a root with NO resolvable git HEAD at all (fresh clone, bare test
    tmpdir) has no history to compare against for ANY path, so the
    round-start discipline is the only guard and every readable path
    passes through.  The real repo always has a HEAD, so the strict
    anchored path is the one that runs in production."""
    import subprocess

    try:
        head_ok = (
            subprocess.run(
                ["git", "-C", root, "rev-parse", "--verify", "-q", "HEAD"],
                capture_output=True,
                timeout=30,
            ).returncode
            == 0
        )
    except Exception:
        head_ok = False
    if not head_ok:
        return {p for p in paths if p}

    anchor = _recording_anchor(root, rnd)
    if anchor is None:
        return set()
    matched: set[str] = set()
    for path in sorted(paths):
        if not path:
            continue  # unknown source file (r10 review: '' crashed relpath)
        try:
            rel = os.path.relpath(path, root)
            proc = subprocess.run(
                ["git", "-C", root, "show", f"{anchor}:{rel}"],
                capture_output=True,
                timeout=30,
            )
            if proc.returncode != 0:
                continue
            with open(path, "rb") as fh:
                if fh.read() == proc.stdout:
                    matched.add(path)
        except Exception:
            pass  # per-path anomaly → not matching → stamp skipped
    return matched


def refresh_snapshot(root: str | None = None) -> dict[str, dict]:
    """(Re)stamp snapshot hashes from current content — run at round
    start (tests/conftest.py does it automatically; also
    ``python -m etl_template_spark.verification``).

    Two guards keep a stamp from ever certifying content the driver did
    not execute:

    - only names whose latest successful record round is NEWER than the
      stamped round are (re)stamped; content drift without a fresh
      official record keeps the old stamp, i.e. stays invalidated;
    - a name is stamped only while its defining module is bit-identical
      to the RECORDING ANCHOR — the commit that added that round's
      CORRECTNESS file, i.e. the tree the driver actually executed
      (r10 review: comparing against current HEAD certified post-edit
      content whenever the builder edited and committed a pending
      module before the round's first pytest run) — if the module
      drifted, the stamp is skipped and the query simply stays in the
      re-record window.

    Returns the new snapshot (also written to disk when changed).
    """
    import inspect

    root = root or repo_root()
    _ensure_registry()
    recorded = latest_recorded_round(root)
    snap = load_snapshot(root)
    pending: dict[str, int] = {}
    for name, rnd in sorted(recorded.items()):
        if name not in REGISTRY:
            continue
        entry = snap.get(name)
        if entry is None or int(entry.get("round", -1)) < rnd:
            pending[name] = rnd
    if not pending:
        return snap
    mod_files = {
        name: inspect.getsourcefile(REGISTRY[name].build) or "" for name in pending
    }
    # anchored per round: each pending name's module must match the
    # tree its OWN recording round executed, not whatever HEAD is now
    matched: set[tuple[str, int]] = set()
    for rnd in sorted(set(pending.values())):
        files = {
            mod_files[n] for n, r in pending.items() if r == rnd and mod_files[n]
        }
        matched |= {
            (f, rnd) for f in _modules_match_recording(root, rnd, files)
        }
    changed = False
    for name, rnd in pending.items():
        if (mod_files[name], rnd) in matched:
            snap[name] = {"round": rnd, "hash": query_content_hash(name)}
            changed = True
    if changed:
        path = os.path.join(root, SNAPSHOT_BASENAME)
        with open(path, "w") as f:
            json.dump(dict(sorted(snap.items())), f, indent=1, sort_keys=True)
            f.write("\n")
    return snap


if __name__ == "__main__":
    snapshot = refresh_snapshot()
    invalid = sorted(invalidated_names())
    print(f"stamped entries: {len(snapshot)}")
    print(f"currently invalidated ({len(invalid)}): {invalid}")
