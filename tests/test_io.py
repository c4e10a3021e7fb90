"""IO-layer tests: reference R1 FAILFAST semantics (die on first
malformed line), schema discipline, versioned read/write resolution."""

from __future__ import annotations

import os

import pytest

from etl_template_spark.io import (
    read_jsonl,
    read_versioned,
    write_versioned,
)

SCHEMA = "id string, name string"


def _write(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_jsonl_failfast_dies_on_malformed_line(spark, tmp_path):
    p = str(tmp_path / "bad.jsonl")
    _write(p, ['{"id": "1", "name": "ok"}', "{not json at all"])
    with pytest.raises(Exception) as ei:
        read_jsonl(spark, p, SCHEMA, mode="FAILFAST").collect()
    assert "Malformed" in str(ei.value) or "FAILFAST" in str(ei.value)


def test_jsonl_blank_lines_skipped(spark, tmp_path):
    # reference skips blank lines (tools.go:533-535)
    p = str(tmp_path / "blank.jsonl")
    _write(p, ['{"id": "1", "name": "a"}', "", '{"id": "2", "name": "b"}'])
    rows = read_jsonl(spark, p, SCHEMA).collect()
    assert sorted(r["id"] for r in rows) == ["1", "2"]


def test_jsonl_unknown_fields_dropped_missing_null(spark, tmp_path):
    # SURVEY §1.3: unknown JSON fields dropped, missing fields NULL
    # (intentional divergence from Go zero-values)
    p = str(tmp_path / "partial.jsonl")
    _write(p, ['{"id": "1", "name": "a", "extra": 99}', '{"id": "2"}'])
    rows = {r["id"]: r for r in read_jsonl(spark, p, SCHEMA).collect()}
    assert rows["1"]["name"] == "a"
    assert rows["2"]["name"] is None
    assert "extra" not in rows["1"].asDict()


def test_versioned_pinned_and_latest(spark, tmp_path):
    root = str(tmp_path)
    df1 = spark.createDataFrame([("1", "v1")], SCHEMA)
    df2 = spark.createDataFrame([("2", "v2")], SCHEMA)
    v1, _ = write_versioned(df1, root, "step")
    v2, _ = write_versioned(df2, root, "step")
    assert (v1, v2) == (1, 2)
    assert read_versioned(spark, root, "step").collect()[0]["name"] == "v2"
    assert read_versioned(spark, root, "step", version=1).collect()[0]["name"] == "v1"


def test_versioned_missing_step_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_versioned(spark, str(tmp_path), "nope")


def test_versioned_json_requires_schema(spark, tmp_path):
    root = str(tmp_path)
    write_versioned(spark.createDataFrame([("1", "a")], SCHEMA), root, "s", fmt="json")
    with pytest.raises(ValueError):
        read_versioned(spark, root, "s", fmt="json")
    rows = read_versioned(spark, root, "s", fmt="json", schema=SCHEMA).collect()
    assert rows[0]["id"] == "1"
