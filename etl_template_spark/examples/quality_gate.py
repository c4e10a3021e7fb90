#!/usr/bin/env python
"""Nightly data-quality gate on the Pipeline layer: the monitoring
operator family (profiling / expectations / anomaly scoring) composed
into the run every landing table should pass BEFORE anything consumes
the refresh — the observability counterpart of the reference's per-step
progress accounting (tools.go:891-951), promoted from "rows moved" to
"rows are believable".

    step      operator family                        plan shape
    ----      ---------------                        ----------
    Profile   per-column profile (q_profile_table)   ONE scan, ONE aggregate
    Gate      expectations vs profile                broadcast join on a literal
                                                     spec; raises StepFailed on
                                                     violation (fail-fast, the
                                                     FAILFAST reader's sibling)
    Anomaly   median/MAD daily scoring               calendar-bounded agg +
              (q_anomaly_mad)                        exact-median passes

The Gate step is the novelty: expectations are DATA (a literal spec
frame — max null fraction, min distinct cardinality per column), the
check is a broadcast join + filter, and a non-empty violation set
raises inside the step so the run manifest records Failed and
downstream steps never execute.  CI drives both paths: the green gate
on the fixture, and a poison-pill spec that must abort the run
(tests/test_pipeline.py) — the same golden-test discipline the atomic
sink has.

Run:  python -m etl_template_spark example quality_gate [sf_dir] [data_root]
      (or `etl-template-spark example quality_gate` once installed)
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import Pipeline, get_spark
from ..io import load_table

SF_DIR = "/root/testdata/sf0.001"

# Expectations for the events landing table: (column, max null fraction,
# minimum distinct count).  A broken export (suddenly-null column,
# collapsed id space) violates one of these long before any consumer
# notices.
DEFAULT_EXPECTATIONS: list[tuple[str, float, int]] = [
    ("event_id", 0.0, 100),
    ("user_id", 0.0, 5),
    ("event_type", 0.0, 3),
    ("ts", 0.0, 100),
    ("value", 0.05, 10),
]


def profile(spark: SparkSession, _: DataFrame | None, sf_dir: str = SF_DIR) -> DataFrame:
    """Profile the landing table (q_profile_table's one-scan aggregate)
    plus the total row count each expectation normalizes against."""
    from ..queries.profiling import profile_frame

    ev = load_table(spark, sf_dir, "events")
    cols = ("event_id", "user_id", "event_type", "ts", "value")
    n = ev.count()
    return profile_frame(ev, cols).withColumn("n_rows", F.lit(n))


def make_gate(expectations: list[tuple[str, float, int]]):
    """Gate step factory: join the literal expectation spec onto the
    profile and fail the STEP (hence the run) when any column violates.
    Returns the per-column report when everything passes, so the run
    manifest carries the evidence, not just a green light."""

    def gate(spark: SparkSession, prof: DataFrame) -> DataFrame:
        spec = spark.createDataFrame(
            expectations, "col_name string, max_null_frac double, min_distinct long"
        )
        report = (
            prof.join(F.broadcast(spec), "col_name")
            .select(
                "col_name",
                "n_null",
                "n_distinct",
                "n_rows",
                (F.col("n_null") > F.col("max_null_frac") * F.col("n_rows")).alias(
                    "null_violation"
                ),
                (F.col("n_distinct") < F.col("min_distinct")).alias(
                    "distinct_violation"
                ),
            )
        )
        bad = report.where(F.col("null_violation") | F.col("distinct_violation"))
        violations = bad.collect()  # bounded: one row per profiled column
        if violations:
            detail = "; ".join(
                f"{r['col_name']}: n_null={r['n_null']} n_distinct={r['n_distinct']}"
                for r in violations
            )
            raise ValueError(f"quality gate violated: {detail}")
        return report

    return gate


def anomaly(spark: SparkSession, _: DataFrame, sf_dir: str = SF_DIR) -> DataFrame:
    """Median/MAD daily anomaly scores (the registered q_anomaly_mad),
    persisted alongside the gate report so on-call reads one versioned
    dataset, not a dashboard."""
    from ..queries.anomaly import q_anomaly_mad

    return q_anomaly_mad(spark, sf_dir)


def build_pipeline(
    data_root: str,
    sf_dir: str = SF_DIR,
    expectations: list[tuple[str, float, int]] | None = None,
) -> Pipeline:
    exp = DEFAULT_EXPECTATIONS if expectations is None else expectations
    return (
        Pipeline("quality_gate", data_root)
        .step("Profile", lambda s, df: profile(s, df, sf_dir))
        .step("Gate", make_gate(exp), input_step="Profile")
        .step("Anomaly", lambda s, df: anomaly(s, df, sf_dir), input_step="Gate")
    )


def run(data_root: str | None = None, sf_dir: str = SF_DIR):
    data_root = data_root or tempfile.mkdtemp(prefix="quality_gate_")
    spark = get_spark(app_name="quality-gate-example")
    p = build_pipeline(data_root, sf_dir)
    result = p.run(spark)
    print(f"status={result.overall_status} root={data_root}")
    for name, st in result.steps.items():
        print(f"  {name}: {st.status} rows={st.rows_out} v={st.output_version}")
    return result


if __name__ == "__main__":
    run(
        sys.argv[2] if len(sys.argv) > 2 else None,
        sys.argv[1] if len(sys.argv) > 1 else SF_DIR,
    )
