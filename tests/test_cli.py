"""CLI contract (etl_template_spark/__main__.py): list / oracle are
instant metadata commands; run executes a real query in-process (the
subprocess path is exercised once for arg-parsing fidelity)."""

from __future__ import annotations

import json
import subprocess
import sys

from etl_template_spark.__main__ import main


def test_cli_list_and_tag_filter(capsys):
    from etl_template_spark.queries import REGISTRY

    assert main(["list"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == len(REGISTRY)
    assert all("\t" in line for line in out)
    assert main(["list", "--tag", "similarity"]) == 0
    tagged = capsys.readouterr().out.strip().splitlines()
    assert 0 < len(tagged) < len(out)
    assert all("similarity" in line for line in tagged)


def test_cli_oracle_prints_sql(capsys):
    assert main(["oracle", "q_agg_group"]) == 0
    out = capsys.readouterr().out
    assert "SELECT" in out.upper()
    assert main(["oracle", "no_such_query"]) == 2


def test_cli_run_and_versioned_out(spark, sf_dir, tmp_path, capsys):
    root = str(tmp_path / "out")
    assert main(["run", "q_sort_limit", "--sf-dir", sf_dir, "--out", root]) == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    meta = json.loads(line)
    assert meta["query"] == "q_sort_limit" and meta["version"] == 1
    from etl_template_spark import read_versioned

    assert read_versioned(spark, root, "q_sort_limit").count() > 0
    # show path (no --out)
    assert main(["run", "q_sort_limit", "--sf-dir", sf_dir, "--show", "3"]) == 0
    assert main(["run", "nope", "--sf-dir", sf_dir]) == 2


def test_cli_subprocess_arg_parsing():
    """One real subprocess round-trip: metadata commands must work
    without a SparkSession and exit cleanly."""
    proc = subprocess.run(
        [sys.executable, "-m", "etl_template_spark", "list", "--tag", "retrieval"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    assert "q_bm25_rank" in proc.stdout
