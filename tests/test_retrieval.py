"""Unit tests for the retrieval family (queries/retrieval.py): URL
canonicalization edge cases and BM25 ranking sanity — the oracle
differential proves cross-engine equality; these prove the SEMANTICS.
"""

from __future__ import annotations


from pyspark.sql import functions as F

from etl_template_spark.queries.retrieval import (
    _BM25_TERMS,
    normalize_url,
    registrable_domain,
)


CASES = [
    # (raw, canonical)
    ("https://www.Site1.Example.com/doc/9", "site1.example.com/doc/9"),
    ("HTTP://site1.example.com/doc/9/", "site1.example.com/doc/9"),
    ("https://site1.example.com:443/doc/9?utm_source=feed", "site1.example.com/doc/9"),
    ("http://m.site1.example.com/doc/9", "site1.example.com/doc/9"),
    (
        "https://site1.example.com/doc/9?ref=rss&utm_campaign=x",
        "site1.example.com/doc/9",
    ),
    ("http://site1.example.com:80/doc/9", "site1.example.com/doc/9"),
    # non-default port survives; non-tracking params survive
    ("https://site1.example.com:8080/doc/9", "site1.example.com:8080/doc/9"),
    ("https://site1.example.com/doc/9?page=2", "site1.example.com/doc/9?page=2"),
    # tracking param FIRST: the '?' it consumed must be restored, so
    # parameter order cannot split one logical URL into two canon keys
    (
        "https://site1.example.com/doc/9?utm_source=a&page=2",
        "site1.example.com/doc/9?page=2",
    ),
    ("https://site1.example.com/doc/9?utm_a=1&utm_b=2", "site1.example.com/doc/9"),
    # host-only URLs: port/slash stripping still applies
    ("https://www.example.co.uk:443/", "example.co.uk"),
    # literal '&' in the PATH (legal per RFC 3986) must survive — it is
    # NOT a dangling query separator and must not collide with '?'
    ("https://site1.example.com/a&b", "site1.example.com/a&b"),
    ("https://site1.example.com/a&b?utm_c=1", "site1.example.com/a&b"),
    # '&' directly after a default port (no '?'): not a query string;
    # the port must survive identically on every application
    ("http://site1.example.com:80&x=1", "site1.example.com:80&x=1"),
    # multiple leading tracking params all drop
    ("https://site1.example.com/d?utm_a=1&utm_b=2&page=3",
     "site1.example.com/d?page=3"),
]


def test_normalize_url_cases(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], ["url"])
    got = [r["c"] for r in df.select(normalize_url(F.col("url")).alias("c")).collect()]
    assert got == [c for _, c in CASES]


def test_registrable_domain_public_suffix_lite(spark):
    rows = [
        ("deep.sub.site1.example.com", "example.com"),
        ("news.bbc.co.uk", "bbc.co.uk"),
        ("shop.company.com.au", "company.com.au"),
        ("blog.firm.co.jp", "firm.co.jp"),
        ("example.com", "example.com"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in rows], ["host"])
    got = [
        r["d"] for r in df.select(registrable_domain(F.col("host")).alias("d")).collect()
    ]
    assert got == [d for _, d in rows]


def test_dedup_url_groups_of_five(spark, sf_dir):
    """The synthetic URL variants collapse 5 consecutive doc_ids into one
    canonical URL; the keeper is crawl-order min."""
    from etl_template_spark.queries import REGISTRY

    rows = REGISTRY["q_dedup_url"].build(spark, sf_dir).collect()
    import math

    from etl_template_spark.io import load_table

    total = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == math.ceil(total / 5)
    for r in rows:
        assert r["n_dups"] <= 5
        assert r["keep_doc_id"] % 5 == 0 or r["keep_doc_id"] == 0
        assert not r["canon_url"].startswith(("http", "www."))
        assert "?" not in r["canon_url"] or "utm" not in r["canon_url"]
        assert r["domain"] in ("example.com", "example.co.uk")


def test_bm25_favors_rare_term(spark, sf_dir):
    """'dup' is ~30x rarer than the other query terms in the fixture —
    documents containing it must dominate the top ranks (idf ordering),
    and scores must be positive and non-increasing."""
    from etl_template_spark.io import load_table
    from etl_template_spark.queries import REGISTRY

    top = REGISTRY["q_bm25_rank"].build(spark, sf_dir).collect()
    assert len(top) > 0
    scores = [r["bm25"] for r in top]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    d = load_table(spark, sf_dir, "documents")
    dup_docs = {
        r["doc_id"]
        for r in d.where(F.col("text").rlike(r"(^| )dup( |$)")).collect()
    }
    if dup_docs:
        top_ids = [r["doc_id"] for r in top[: min(5, len(dup_docs))]]
        assert set(top_ids) <= dup_docs, (
            "rare-term documents should lead the BM25 ranking"
        )
    assert set(_BM25_TERMS) == {"spark", "window", "dup"}


# ---------------------------------------------------------------------------
# property: URL canonicalization is idempotent
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_scheme = st.sampled_from(["http://", "https://", "HTTP://", "HTTPS://", ""])
_sub = st.sampled_from(["", "www.", "m.", "blog.", "a.b."])
_host = st.sampled_from(
    ["example.com", "Example.CO.UK", "site9.example.com", "firm.co.jp"]
)
_port = st.sampled_from(["", ":80", ":443", ":8080"])
_path = st.sampled_from(["", "/", "/doc/3", "/a/b/", "/x%20y", "/a&b", "&x=1"])
_query = st.sampled_from(
    [
        "", "?utm_source=a", "?page=2", "?ref=rss&utm_campaign=x",
        "?utm_a=1&utm_b=2", "?utm_source=a&page=2", "?page=2&utm_source=a",
        "?utm_a=1&x=2&utm_b=3",
    ]
)


@given(parts=st.tuples(_scheme, _sub, _host, _port, _path, _query))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_normalize_url_is_idempotent(spark, parts):
    """A canonicalizer must be a projection: applying it twice equals
    applying it once, for any composition of scheme/subdomain/port/
    tracking-query messiness.  (A rule that re-matches its own output —
    e.g. a port stripper that exposes a new `host:port` prefix — breaks
    re-runs of incremental pipelines that canonicalize already-canonical
    URLs.)"""
    url = "".join(parts)
    df = spark.createDataFrame([(url,)], ["url"])
    once = df.select(normalize_url(F.col("url")).alias("c"))
    twice = once.select(F.col("c").alias("url")).select(
        normalize_url(F.col("url")).alias("c")
    )
    a = once.collect()[0]["c"]
    b = twice.collect()[0]["c"]
    assert a == b, f"not idempotent: {url!r} -> {a!r} -> {b!r}"


def test_normalize_url_param_order_insensitive(spark):
    """utm-first and utm-last spellings of the same logical URL must
    canonicalize to ONE key (the dedup grouping key)."""
    df = spark.createDataFrame(
        [
            ("https://site1.example.com/doc/9?utm_source=a&page=2",),
            ("https://site1.example.com/doc/9?page=2&utm_source=a",),
        ],
        ["url"],
    )
    got = {r["c"] for r in df.select(normalize_url(F.col("url")).alias("c")).collect()}
    assert got == {"site1.example.com/doc/9?page=2"}


def test_lateral_outer_preserves_every_document(spark, sf_dir):
    """q_lateral_outer's contract: rows == docs-without-hits (one NULL
    row each) + total hit occurrences; no document vanishes."""
    from etl_template_spark.io import load_table
    from etl_template_spark.queries import REGISTRY

    rows = REGISTRY["q_lateral_outer"].build(spark, sf_dir).collect()
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()
    assert len({r["doc_id"] for r in rows}) == n_docs  # every doc appears
    null_rows = [r for r in rows if r["hit"] is None]
    hit_rows = [r for r in rows if r["hit"] == "dup"]
    assert len(null_rows) + len(hit_rows) == len(rows)
    assert len(null_rows) > 0, "the OUTER edge never exercised"
    # a doc has EITHER its hits OR exactly one NULL row, never both
    null_ids = {r["doc_id"] for r in null_rows}
    hit_ids = {r["doc_id"] for r in hit_rows}
    assert not (null_ids & hit_ids)


def test_normalize_url_exhaustive_cross_engine(spark, duck):
    """EXHAUSTIVE sweep of the structured messy-URL universe (full
    cartesian product of the hypothesis strategy atoms, ~22k URLs) in
    ONE Spark job and ONE DuckDB query: (a) Spark and the oracle's
    shared normalize_url_sql agree on every input, and (b) the Spark
    canonicalizer is idempotent on every input.  Subsumes sampling for
    this universe — any rule-interaction bug between these atoms is
    caught here, not left for a future fixture to trip."""
    import itertools

    from etl_template_spark.queries.retrieval import normalize_url_sql

    schemes = ["http://", "https://", "HTTP://", "HTTPS://", ""]
    subs = ["", "www.", "m.", "blog.", "a.b."]
    hosts = ["example.com", "Example.CO.UK", "site9.example.com", "firm.co.jp"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/doc/3", "/a/b/", "/x%20y", "/a&b", "&x=1"]
    queries = [
        "", "?utm_source=a", "?page=2", "?ref=rss&utm_campaign=x",
        "?utm_a=1&utm_b=2", "?utm_source=a&page=2", "?page=2&utm_source=a",
        "?utm_a=1&x=2&utm_b=3",
    ]
    urls = [
        "".join(parts)
        for parts in itertools.product(schemes, subs, hosts, ports, paths, queries)
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    out = df.select(
        "url",
        normalize_url(F.col("url")).alias("c1"),
        normalize_url(normalize_url(F.col("url"))).alias("c2"),
    ).collect()
    not_idem = [(r["url"], r["c1"], r["c2"]) for r in out if r["c1"] != r["c2"]]
    assert not not_idem, f"{len(not_idem)} non-idempotent, first: {not_idem[0]}"

    duck.execute("CREATE OR REPLACE TEMP TABLE _urls (url VARCHAR)")
    duck.executemany("INSERT INTO _urls VALUES (?)", [(u,) for u in urls])
    duck_rows = duck.sql(
        f"SELECT url, {normalize_url_sql('url')} AS c FROM _urls"
    ).fetchall()
    duck_map = dict(duck_rows)
    diffs = [
        (r["url"], r["c1"], duck_map[r["url"]])
        for r in out
        if r["c1"] != duck_map[r["url"]]
    ]
    assert not diffs, f"{len(diffs)} cross-engine mismatches, first: {diffs[0]}"
    duck.execute("DROP TABLE _urls")


def test_bm25_library_form_parameterizes(spark, sf_dir):
    """bm25_rank is reusable beyond the registered query: a different
    term set returns a differently-ranked, well-formed result, and the
    registered constants reproduce q_bm25_rank exactly."""
    from etl_template_spark.io import load_table
    from etl_template_spark.queries import REGISTRY
    from etl_template_spark.queries.retrieval import bm25_rank

    d = load_table(spark, sf_dir, "documents")
    fixed = REGISTRY["q_bm25_rank"].build(spark, sf_dir).collect()
    same = bm25_rank(d, _BM25_TERMS).collect()
    assert [tuple(r) for r in fixed] == [tuple(r) for r in same]
    other = bm25_rank(d, ("merge", "batch"), topk=5).collect()
    assert len(other) == 5
    assert all(r["bm25"] > 0 for r in other)
    assert {r["doc_id"] for r in other} != {r["doc_id"] for r in fixed[:5]}
