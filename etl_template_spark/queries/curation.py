"""Corpus-curation operators, round 3 additions: PII scrubbing, corpus
vocabulary (n-gram frequencies), token repetition signals, and the
Hilbert-clustered sink.

These extend the training-data pipeline surface (SURVEY.md §2B, LLM/
curation family): everything is JVM-side expression work — regex
scrubbing and counting compile to whole-stage codegen, the vocabulary
top-k is a distributed partial top-k (TakeOrderedAndProject), and the
repetition ratios are one token explode + two hash aggregates with
map-side partial aggregation.  No UDFs, no driver loops.

This module registers AFTER every other query module (queries/__init__
imports it last) so its entries land behind the pinned round-3
correctness window (tests/test_entry_contract.py).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table, read_versioned, write_versioned
from ..operators.dedup import shingles_col, tokens_col
from ..registry import register

# Patterns restricted to the syntax Java regex and RE2 share (no \b, \d
# or lookaround), so engine and oracle scrub identically.
_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4 = r"([0-9]{1,3}\.){3}[0-9]{1,3}"
_PHONE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}"


def pii_scrub_cols(text: str = "text") -> dict[str, Column]:
    """The scrub expressions (counts + redacted text) over ``text`` —
    shared by q_pii_scrub and the planted-PII unit test."""
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col(text), _EMAIL, "[EMAIL]"),
            _IPV4, "[IP]",
        ),
        _PHONE, "[PHONE]",
    )
    return {
        "n_emails": F.regexp_count(text, F.lit(_EMAIL)).cast("bigint"),
        "n_ips": F.regexp_count(text, F.lit(_IPV4)).cast("bigint"),
        "n_phones": F.regexp_count(text, F.lit(_PHONE)).cast("bigint"),
        "scrubbed": scrubbed,
    }


@register(
    "q_pii_scrub",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{_IPV4}'))  AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(text, '{_PHONE}')) AS BIGINT) AS n_phones,
           regexp_replace(
             regexp_replace(
               regexp_replace(text, '{_EMAIL}', '[EMAIL]', 'g'),
               '{_IPV4}', '[IP]', 'g'),
             '{_PHONE}', '[PHONE]', 'g') AS scrubbed
    FROM documents
    ORDER BY doc_id
    """,
    tags=("llm", "curation"),
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass (emails / IPv4 / intl phone numbers →
    typed placeholders) with per-document match counts — the mandatory
    scrub before a crawl becomes training data.  Pure ``regexp_replace``
    / ``regexp_count`` projection: one scan, no shuffle, codegen'd; the
    replacement order (email → ip → phone) is part of the contract and
    mirrored in the oracle so overlapping matches resolve identically.
    The fixture corpus is synthetic word-salad (zero matches expected);
    tests/test_operators.py plants real PII to prove the redaction."""
    d = load_table(spark, sf_dir, "documents")
    cols = pii_scrub_cols("text")
    return d.select("doc_id", *[c.alias(n) for n, c in cols.items()])


@register(
    "q_ngram_freq",
    oracle="""
    WITH grams AS (
      SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
             i -> array_to_string((string_split(text, ' '))[i:i+1], ' '))) AS ngram
      FROM documents)
    SELECT ngram, COUNT(*) AS freq
    FROM grams
    GROUP BY ngram
    ORDER BY freq DESC, ngram
    LIMIT 20
    """,
    tags=("llm", "curation"),
)
def q_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide bigram vocabulary: the top-20 most frequent 2-grams
    (every occurrence counts — unlike the dedup shingles, which are
    per-document DISTINCT).  The shape that seeds a BPE/WordPiece vocab
    build.  Explode → hash aggregate (map-side partial) → global top-k:
    ``orderBy().limit()`` plans as TakeOrderedAndProject, a per-partition
    top-20 + driver merge — the vocab table itself is never globally
    sorted.  Tiebreak on the ngram value makes rank 20 deterministic."""
    d = load_table(spark, sf_dir, "documents")
    grams = d.select(F.explode(shingles_col(tokens_col(), 2)).alias("ngram"))
    return (
        grams.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("ngram"))
        .limit(20)
    )


@register(
    "q_token_type_ratio",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
    per_tok AS (
      SELECT doc_id, t, COUNT(*) AS cnt FROM tok GROUP BY doc_id, t)
    SELECT doc_id,
           SUM(cnt)  AS n_tokens,
           COUNT(*)  AS n_types,
           round(COUNT(*) * 1.0 / SUM(cnt), 6) AS type_token_ratio,
           round(MAX(cnt) * 1.0 / SUM(cnt), 6) AS top_token_share
    FROM per_tok
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    tags=("llm", "curation"),
)
def q_token_type_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition signals per document: type/token ratio and the share
    of the single most-repeated token — the Gopher-style filters that
    drop looping/boilerplate pages before training.  One explode + two
    hash aggregates (per-(doc,token) counts, then per-doc rollup), both
    partial-aggregated map-side; ratios are single IEEE divisions of
    exact integers, so the values hash bit-identically cross-engine."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens_col()).alias("t"))
    per_tok = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("cnt"))
    return per_tok.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.round(F.count(F.lit(1)) * 1.0 / F.sum("cnt"), 6).alias("type_token_ratio"),
        F.round(F.max("cnt") * 1.0 / F.sum("cnt"), 6).alias("top_token_share"),
    )


@register(
    "q_sink_hilbert",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
    FROM lineitem
    ORDER BY l_orderkey, l_partkey, l_linenumber
    """,
    tags=("sink", "etl"),
)
def q_sink_hilbert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-clustered versioned write + read-back (layout.py):
    lineitem clustered on the 2-D Hilbert position of (l_orderkey,
    l_partkey), range-sorted, committed, read back.  The oracle reads
    the source parquet — a match proves the re-layout is lossless;
    tests/test_io.py asserts the physical property (row-group pruning
    on BOTH dimensions, curve bit-exact vs the classic automaton)."""
    from ..layout import H_COL, with_hilbert

    root = tempfile.mkdtemp(prefix="etl_hilbert_")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    h = with_hilbert(li, ["l_orderkey", "l_partkey"], bits=16)
    write_versioned(h, root, "li_h", sort_by=[H_COL], sort_partitions=8)
    return read_versioned(spark, root, "li_h").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
