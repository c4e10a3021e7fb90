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


def _modules_clean_vs_head(root: str, paths: set[str]) -> set[str]:
    """Subset of ``paths`` (absolute) whose working-tree content equals
    git HEAD — i.e. still exactly what the just-committed correctness
    round executed.  If git is unavailable, every path is treated as
    clean (round-start discipline is then the only guard)."""
    import subprocess

    # First establish that a comparison is even possible: a resolvable
    # HEAD in root's repository.  Without this guard, "git diff HEAD"
    # outside a repo / on an unborn HEAD exits 1 — the SAME code as a
    # genuine dirty diff — and no returncode policy can tell them
    # apart.  With it, the diff's returncode alone is unambiguous.
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
        return set(paths)  # no history to check → trust round-start discipline

    clean: set[str] = set()
    for path in sorted(paths):
        rel = os.path.relpath(path, root)
        try:
            proc = subprocess.run(
                ["git", "-C", root, "diff", "--quiet", "HEAD", "--", rel],
                capture_output=True,
                timeout=30,
            )
            # Returncode ALONE decides: 0 = identical to HEAD; anything
            # else (1 = genuinely differs, >=2 = per-path git failure,
            # e.g. exit 128) = NOT clean.  Treating a git FAILURE as
            # clean would let a genuinely edited module keep its stale
            # stamp (r5 ADVICE); treating it as dirty merely skips the
            # stamp, so the query re-records — a wasted window slot at
            # worst, never a stale pass.  The repo-wide failure modes
            # (no repo, unborn HEAD, dubious ownership) already short-
            # circuit through the HEAD pre-check above, so a rc>=2 here
            # is a rare per-path anomaly, not the common case.  stderr
            # is deliberately ignored: git emits warnings (CRLF,
            # permissions) alongside a real exit-0 clean diff.
            if proc.returncode == 0:
                clean.add(path)
        except Exception:
            # The HEAD pre-check above proved git exists and the repo is
            # readable, so an exception here is a per-path anomaly (e.g.
            # a timeout under a CPU-steal burst) — resolve the ambiguity
            # to NOT-clean, same as rc >= 2: the stamp is skipped and
            # the query re-records, never certifying unverified content.
            pass
    return clean


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
      to git HEAD (the state the just-landed round ran, since the
      driver commits before recording) — if the builder edited the
      module first, the stamp is skipped and the query simply stays in
      the re-record window.

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
    clean = _modules_clean_vs_head(root, set(mod_files.values()))
    changed = False
    for name, rnd in pending.items():
        if mod_files[name] in clean:
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
