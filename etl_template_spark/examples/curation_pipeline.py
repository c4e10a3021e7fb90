#!/usr/bin/env python
"""Training-data curation end-to-end on the Pipeline layer: the
LLM-pipeline operator families (SURVEY.md §2B north star) composed into
one resumable, versioned, fail-fast run — the shape a real pretraining
data refresh takes.

    step      operator family                      plan shape
    ----      ---------------                      ----------
    Scrub     PII redaction (q_pii_scrub)          pure projection, zero shuffle
    Sample    weighted mixture (q_sample_weighted) broadcast spec + hash filter
    Budget    char-budget cap (q_sample_budget)    per-source windowed prefix sum
    Pack      sequence packing (q_pack_sequences)  per-domain windowed prefix sum

This is the full mixture-build chain: rate the sources, cap each
source's char mass, lay the survivors into training sequences.

Every step writes an immutable version under ``output/<step>/v=N`` with
the atomic claim, so a crashed run resumes at step granularity
(``resume=True``) and auditors can diff any two refreshes.  The
manifest records per-step row counts via observed metrics — no second
scan of written data.

Run:  python -m etl_template_spark example curation_pipeline [sf_dir] [data_root]
      (or `etl-template-spark example curation_pipeline` once installed)
Also executed in CI (tests/test_pipeline.py::test_curation_example_runs)
so this document cannot rot.
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from .. import Pipeline, get_spark
from ..io import load_table

SF_DIR = "/root/testdata/sf0.001"
SEQ_BUDGET = 512
BUDGET_FRAC = 0.6  # q_sample_budget's fraction — keep 60% of each source's chars


def scrub(spark: SparkSession, _: DataFrame | None, sf_dir: str = SF_DIR) -> DataFrame:
    """PII-redact the raw corpus (regex projection — codegen'd, no
    shuffle; same expressions as the registered q_pii_scrub)."""
    from ..queries.curation import pii_scrub_cols

    d = load_table(spark, sf_dir, "documents")
    cols = pii_scrub_cols("text")
    return d.select(
        "doc_id", "source", "lang",
        cols["scrubbed"].alias("text"),
        (cols["n_emails"] + cols["n_ips"] + cols["n_phones"]).alias("n_pii"),
    )


def sample(spark: SparkSession, scrubbed: DataFrame) -> DataFrame:
    """Deterministic weighted mixture over the scrubbed corpus: the
    per-source rate spec broadcasts onto the scan; acceptance is a pure
    hash-bucket predicate (q_sample_weighted's discipline), so re-runs
    and backfills keep identical rows."""
    from ..queries.sampling import hash_bucket, mixture_spec

    spec = mixture_spec(scrubbed)
    return (
        scrubbed.withColumn("bucket", hash_bucket(F.col("doc_id"), 1000).cast("int"))
        .join(F.broadcast(spec), "source")
        .where(F.col("bucket") < F.col("rate"))
        .drop("bucket", "rate")
    )


def budget(spark: SparkSession, sampled: DataFrame) -> DataFrame:
    """Cap each source's character mass at BUDGET_FRAC, keeping the
    longest documents first (q_sample_budget's discipline: the
    cum-BEFORE predicate keeps a source's first doc even when it alone
    exceeds the budget; one windowed prefix sum per source partition —
    sources fill in parallel)."""
    w = (
        Window.partitionBy("source")
        .orderBy(F.length("text").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wt = Window.partitionBy("source")
    n_chars = F.length("text").cast("bigint")
    return (
        sampled.withColumn("__n", n_chars)
        .withColumn("__cum_before", F.coalesce(F.sum("__n").over(w), F.lit(0)))
        .withColumn("__total", F.sum("__n").over(wt))
        .where(F.col("__cum_before") < BUDGET_FRAC * F.col("__total"))
        .drop("__n", "__cum_before", "__total")
    )


def pack(spark: SparkSession, sampled: DataFrame) -> DataFrame:
    """Lay the sampled documents end-to-end per (source, lang) packing
    domain and compute each doc's training-sequence placement (the
    q_pack_sequences shape: one windowed prefix sum per domain)."""
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("bigint")
    w = (
        Window.partitionBy("source", "lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = sampled.select("source", "lang", "doc_id", n_tokens.alias("n_tokens"))
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return d.select(
        "source", "lang", "doc_id", "n_tokens",
        F.floor(cum / SEQ_BUDGET).alias("seq_idx"),
        (cum % SEQ_BUDGET).alias("seq_offset"),
    )


def build_pipeline(data_root: str, sf_dir: str = SF_DIR) -> Pipeline:
    return (
        Pipeline("curation", data_root)
        .step("Scrub", lambda s, df: scrub(s, df, sf_dir))
        .step("Sample", sample, input_step="Scrub")
        .step("Budget", budget, input_step="Sample")
        .step("Pack", pack, input_step="Budget", register_stats=True)
    )


def run(data_root: str | None = None, sf_dir: str = SF_DIR):
    data_root = data_root or tempfile.mkdtemp(prefix="curation_")
    spark = get_spark(app_name="curation-example")
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
