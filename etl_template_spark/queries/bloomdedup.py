"""Membership-prefiltered cross-corpus exact dedup (round 6).

The sketch-prefilter pattern as a first-class operator: before joining
a new crawl shard against the corpus digest index, test every shard
document against a COMPACT MEMBERSHIP SET of the corpus — here the
distinct truncated digest buckets ``xxhash64(digest) mod 2^22`` (8
bytes per corpus doc, capped at 4M rows total, always broadcastable) —
and let only probable duplicates reach the exact digest semi-join.

The structural guarantees are a Bloom filter's: truncation cannot lose
a true member (no false negatives, so nothing real is skipped), and
bucket collisions (false positives) are removed by the exact join.  A
single-hash bucket set trades a few x more false positives for pure
DataFrame expressibility — PySpark does not expose ``bloom_filter_agg``
/ ``might_contain`` in the public function registry (they exist only as
optimizer-injected runtime filters, which session.py already enables
for joins Catalyst can see through); a JVM deployment would swap
``df.stat.bloomFilter`` into the same two-phase plan.

Why this matters at 100 TB: in steady-state ingest most of a fresh
crawl is NEW, so the exact join's shuffle shrinks from |shard| rows to
|probable dups|; the prefilter itself is one broadcast semi-join
against a bounded-size bucket table that is CACHEABLE across ingests
(append buckets per accepted shard — distinct-union maintains it).
The final result is EXACT — identical to the plain semi-join — which
is what makes the query strictly SQL-oracle-checkable despite the
lossy intermediate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

# 2^22 buckets (pmod, not %: Spark's % is signed and would double the
# id range): at most 4M distinct 8-byte bucket ids (~32 MB broadcast
# ceiling) regardless of corpus size; FP rate ~ |corpus|/2^22 per probe
_BUCKETS = 1 << 22


@register(
    "q_dedup_bloom",
    oracle="""
    WITH shard AS (
      SELECT doc_id, sha256(text) AS h FROM documents WHERE doc_id % 10 = 0),
    corpus AS (
      SELECT DISTINCT sha256(text) AS h FROM documents WHERE doc_id % 3 = 0)
    SELECT s.doc_id,
           CASE WHEN c.h IS NOT NULL THEN 'dup' ELSE 'keep' END AS verdict
    FROM shard s LEFT JOIN corpus c USING (h)
    ORDER BY s.doc_id
    """,
    tags=("llm", "dedup", "sketch"),
)
def q_dedup_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus exact dedup behind a membership prefilter: a
    re-crawled shard (doc_id % 10 == 0, overlapping the corpus
    doc_id % 3 == 0 at every 30th doc) probes the corpus's truncated-digest bucket
    set (broadcast semi-join — definite-new docs exit here and never
    shuffle), survivors go through the exact digest semi-join that
    removes bucket-collision false positives.  No false negatives ⇒
    the output (doc_id, dup|keep for every shard doc) is EXACTLY the
    plain semi-join's — the oracle states that plain join, and the
    differential hash check passing IS the no-false-negative proof.
    tests/test_plans.py pins the two-phase plan shape."""
    d = load_table(spark, sf_dir, "documents")
    # the re-crawl shape: the shard OVERLAPS the corpus (every 30th doc
    # is in both), so both verdict branches carry rows in the official
    # check — the fixture has no duplicate texts, so disjoint splits
    # would leave the dup branch structurally dead
    shard = d.where(F.col("doc_id") % 10 == 0).select(
        "doc_id", F.sha2("text", 256).alias("h")
    )
    corpus = d.where(F.col("doc_id") % 3 == 0).select(
        F.sha2("text", 256).alias("h")
    ).distinct()

    buckets = corpus.select(
        F.pmod(F.xxhash64("h"), F.lit(_BUCKETS)).alias("bucket")
    ).distinct()
    probable = (
        shard.withColumn("bucket", F.pmod(F.xxhash64("h"), F.lit(_BUCKETS)))
        .join(F.broadcast(buckets), "bucket", "left_semi")
        .select("doc_id", "h")
    )
    dup_ids = probable.join(corpus, "h", "left_semi").select("doc_id")
    return (
        shard.join(
            dup_ids.withColumn("__dup", F.lit(1)), "doc_id", "left"
        )
        .select(
            "doc_id",
            F.when(F.col("__dup").isNotNull(), F.lit("dup"))
            .otherwise(F.lit("keep"))
            .alias("verdict"),
        )
        .orderBy("doc_id")
    )
