"""Cross-encoder pair-scoring query (SURVEY.md §7 phase-7) — the
retrieval-reranking / near-dup-adjudication shape over ``documents``.

See operators/crossenc.py for the pipeline rationale (blocked candidate
generation → JVM gate → one Arrow boundary → injectable model).  The
registered query runs the DEFAULT stub scorer, whose arithmetic the
DuckDB oracle reproduces exactly — so the driver hash-checks the whole
plumbing: blocking, salting, gating, Arrow round-trip, schema, and the
score column itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

_LEN_GATE = 64  # max |len_a - len_b| allowed through to scoring


@register(
    "q_cross_encoder_score",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, lang, length(text) AS len FROM documents)
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(a.len AS BIGINT) AS len_a,
           CAST(b.len AS BIGINT) AS len_b,
           CAST(least(a.len, b.len) AS DOUBLE)
             / greatest(a.len, b.len, 1) AS score
    FROM d a JOIN d b
      ON a.source = b.source AND a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE abs(a.len - b.len) <= {_LEN_GATE}
    ORDER BY a_id, b_id
    """,
    tags=("llm", "similarity", "udf"),
)
def q_cross_encoder_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-encoder scoring of candidate document pairs: pairs block on
    (source, lang) through the SALTED block join (hot blocks split into
    deterministic sub-blocks — one giant source can't serialize), a
    JVM-side length gate (|Δlen| ≤ 64) prunes before Python, and the
    survivors cross the Arrow boundary ONCE to be scored in vectorized
    batches (operators/crossenc.py::score_pairs, injectable model,
    deterministic stub by default).

    Why the gate matters at 100 TB: the expensive resource is model
    forward passes, not shuffle — every pair the JVM drops is a pair
    the GPU never sees.  The emitted lengths make the score auditable
    downstream (and let the oracle recompute it exactly)."""
    from ..operators.crossenc import score_pairs
    from ..operators.topk import salted_block_join

    # block on (source, lang) as TWO join columns, not a concat key:
    # column-wise equality keeps SQL NULL semantics (a NULL lang pairs
    # with nothing, exactly as the oracle's a.lang = b.lang) and cannot
    # collide on separator-bearing values ('a|b' + 'c' vs 'a' + 'b|c')
    d = load_table(spark, sf_dir, "documents").select(
        F.col("source"),
        F.col("lang"),
        F.col("doc_id"),
        F.col("text"),
        F.length("text").cast("bigint").alias("len"),
    )
    a = d.select(
        "source", "lang", F.col("doc_id").alias("a_id"),
        F.col("text").alias("text_a"), F.col("len").alias("len_a"),
    )
    b = d.select(
        "source", "lang", F.col("doc_id").alias("b_id"),
        F.col("text").alias("text_b"), F.col("len").alias("len_b"),
    )
    pairs = (
        salted_block_join(a, b, ["source", "lang"], "b_id")
        .where(F.col("a_id") < F.col("b_id"))
        .where(F.abs(F.col("len_a") - F.col("len_b")) <= _LEN_GATE)
        .select("a_id", "b_id", "len_a", "len_b", "text_a", "text_b")
    )
    return score_pairs(pairs)
