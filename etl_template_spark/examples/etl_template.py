#!/usr/bin/env python
"""The reference's own ETL pipeline, end-to-end on the engine.

Reproduces /root/reference/etl.go:146-159 (main) — the three-step
Extract → Transform → Load run — on the Pipeline layer, mapping each
reference mechanism to its Spark-native replacement:

    reference (etl.go / tools/tools.go)         engine
    -----------------------------------         ------------------------
    ExtractUsers literal slice (etl.go:26-51)   createDataFrame fixture
    transformSingleRecord (etl.go:54-60)        Column projection (R9)
    per-record JSONL loop (tools.go:676-806)    one Spark job per step
    versioned output N.jsonl (tools.go:343-387) output/<step>/v=N/
    etl_run_status.json (tools.go:84-272)       run manifest JSON
    per-record LoopState resume (tools.go:611)  resume=True step skip

Run:  python -m etl_template_spark example etl_template [data_root]
      (or `etl-template-spark example etl_template` once installed)
Also executed in CI (tests/test_pipeline.py::test_worked_example_runs)
so this document cannot rot.
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import Pipeline, get_spark, read_versioned

# The reference's literal extract fixture (etl.go:26-51), including its
# two poison-pill sentinels ("Bad User Transform"/"Bad User Load",
# etl.go:36-42) — inert there and here; tests/test_pipeline.py covers
# the failing-transform path they scaffold.
USERS = [
    ("1", "Alice"),
    ("2", "Bob"),
    ("3", "Charlie"),
    ("10", "Bad User Transform"),
    ("11", "Bad User Load"),
    ("12", "Eve"),
]


def extract_users(spark: SparkSession, _: DataFrame | None) -> DataFrame:
    """ExtractUsers (etl.go:26-51): an in-memory literal source (R10)."""
    return spark.createDataFrame(USERS, "id string, name string")


def main_loop(spark: SparkSession, users: DataFrame | None) -> DataFrame:
    """MainLoop's transformSingleRecord (etl.go:54-60) as a projection:
    userId <- id, processedName <- 'Processed_<name>_Individually',
    timestamp <- now().  One whole-stage-codegen'd map over the input —
    the reference's per-record callback loop collapses into Column
    expressions (R9), which is the entire point of the engine."""
    assert users is not None
    return users.select(
        F.col("id").alias("userId"),
        F.concat(F.lit("Processed_"), F.col("name"), F.lit("_Individually")).alias(
            "processedName"
        ),
        F.date_format(
            F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSSXXX"
        ).alias("timestamp"),  # RFC3339Nano-shaped string, like etl.go:58
    )


def load_output(spark: SparkSession, transformed: DataFrame | None) -> DataFrame:
    """LoadOutput (etl.go:102-144): in the reference this re-streams the
    temp JSONL into the final versioned file; on the engine the load is
    the identity over the upstream step's versioned output (the write
    itself is the versioned, atomic commit)."""
    assert transformed is not None
    return transformed


def run(data_root: str) -> None:
    spark = get_spark(app_name="etl-template-example")
    p = (
        Pipeline("etl_template", data_root)
        .step("ExtractUsers", extract_users)
        .step("MainLoop", main_loop, input_step="ExtractUsers")
        # jsonl output for byte-level fidelity with the reference's sink
        .step("LoadOutput", load_output, input_step="MainLoop", fmt="json")
    )
    result = p.run(spark)
    print(result.log_status())
    out = read_versioned(
        spark,
        data_root,
        "LoadOutput",
        fmt="json",
        schema="userId string, processedName string, timestamp string",
    )
    out.show(truncate=False)
    print(f"status manifest: {p.status_path}")


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="etl_example_"))
