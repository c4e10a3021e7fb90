"""Retrieval-for-curation operators (round 6): BM25 corpus ranking over
the inverted index, and host-normalized URL dedup.

Both close capability classes a training-data pipeline needs that the
round-5 surface lacked:

- **BM25** is the standard retrieval scorer for contamination checks,
  quality-by-query probes, and targeted corpus slicing ("pull the top-k
  documents about X for inspection") — tf-idf (q_tfidf) ranks terms
  WITHIN a document; BM25 ranks DOCUMENTS against a query, with the
  term-frequency saturation (k1) and length normalization (b) that make
  raw tf-idf unusable on mixed-length corpora.
- **URL dedup** is the first dedup pass every crawl-derived corpus runs
  (before any content hashing): canonicalize scheme/host/port/tracking
  params and collapse to one row per canonical URL.

Float discipline (the repo standard, compat.py): per-term BM25 scores
are deterministic per-row arithmetic rounded to 6 decimals; the per-doc
sum routes through exact decimal accumulation (``dsum``) so both
engines agree bit-for-bit regardless of summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..compat import dsum, dsum_sql
from ..io import load_table
from ..operators.dedup import tokens_col
from ..registry import register

# ---------------------------------------------------------------------------
# q_bm25_rank — Okapi BM25 document ranking for a literal query
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "window", "dup")  # fixed retrieval query
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    # idf: the standard +1-inside-the-log Okapi variant (never negative,
    # matching Lucene); tf saturation and length normalization per
    # Robertson & Zaragoza 2009.  All inputs to the per-term score are
    # integers or single IEEE divisions -> deterministic cross-engine;
    # the per-doc sum is decimal-exact.
    # (k1 + 1.0) is cast to DOUBLE before the tf multiply: DuckDB would
    # otherwise keep tf*(k1+1) on its exact DECIMAL path while Spark
    # computes fl(tf * fl(k1+1)) — the two differ by 1-2 ulp for ~half
    # of tf values, leaving round(...,6) to absorb the gap (round-6
    # ADVICE).  The cast puts both engines on the identical double path
    # (verified: (1.2+1.0)::DOUBLE and every tf*that product match
    # Python's bit patterns exactly).  Every other literal in the score
    # is either exactly representable (0.5, 1.0, 0.75) or already
    # promoted to double by an adjacent division.
    score = (
        f"round(ln((n.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) * "
        f"(tf.tf * (({_BM25_K1} + 1.0)::DOUBLE)) / "
        f"(tf.tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / "
        f"(n.n_tokens * 1.0 / n.n_docs))), 6)"
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    n AS (
      SELECT COUNT(*) AS n_docs,
             (SELECT COUNT(*) FROM tok) AS n_tokens
      FROM documents),
    qtok AS (SELECT doc_id, term FROM tok WHERE term IN ({terms})),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM qtok GROUP BY 1, 2),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM qtok GROUP BY 1),
    scored AS (
      SELECT tf.doc_id, {score} AS term_score
      FROM tf
      JOIN df USING (term)
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN n),
    agg AS (
      SELECT doc_id,
             {dsum_sql('term_score')} AS bm25,
             CAST(COUNT(*) AS INT) AS n_hit
      FROM scored GROUP BY doc_id)
    SELECT doc_id, bm25, n_hit
    FROM agg
    ORDER BY bm25 DESC, doc_id
    LIMIT {_BM25_TOPK}
    """


@register("q_bm25_rank", oracle=_bm25_oracle(), tags=("llm", "text", "retrieval"))
def q_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by Okapi BM25 for a fixed 3-term query — the
    retrieval probe a curation pipeline runs for contamination checks
    and targeted corpus slicing.

    Plan shape, and why it holds at 100 TB: the token stream is filtered
    to the |Q| query terms BEFORE any shuffle, so tf and df aggregate a
    |Q|-bounded slice of the corpus (partial map-side combines, then a
    tiny shuffle) — the full-vocabulary inverted index is never
    materialized.  Document lengths are one partial-agg pass over the
    corpus (reusable across queries in a real deployment — the `dl`
    table is query-independent).  N/avgdl are a broadcast 1-row global;
    the final ranking is TakeOrderedAndProject (bounded heap).

    Scoring: idf = ln((N - df + 0.5)/(df + 0.5) + 1) (Lucene's
    never-negative variant), tf saturation k1=1.2, length normalization
    b=0.75.  Per-term scores round to 6 decimals (deterministic per-row
    IEEE arithmetic); the per-doc sum is decimal-exact (compat.dsum), so
    the DuckDB oracle reproduces every rank bit-for-bit."""
    d = load_table(spark, sf_dir, "documents")
    return bm25_rank(d, _BM25_TERMS, k1=_BM25_K1, b=_BM25_B, topk=_BM25_TOPK)


def bm25_rank(
    d: DataFrame,
    terms: tuple[str, ...] | list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = _BM25_K1,
    b: float = _BM25_B,
    topk: int = _BM25_TOPK,
) -> DataFrame:
    """Reusable Okapi BM25 ranking over any (id, text) frame — the
    library form behind q_bm25_rank; swap ``terms`` per retrieval query
    while the corpus-side stats (dl, N, avgdl) stay query-independent
    and cacheable across calls in a real deployment."""
    tok = d.select(id_col, F.explode(tokens_col(text_col)).alias("term"))
    dl = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    # n_tokens derives from dl (no second explode pass; a NULL-text doc
    # contributes no token rows in EITHER engine, so the totals agree),
    # but n_docs must count DOCUMENTS — deriving it from dl would
    # undercount NULL-text docs relative to the oracle's COUNT(*)
    n = F.broadcast(d.agg(F.count(F.lit(1)).alias("n_docs"))).crossJoin(
        dl.agg(F.sum("dl").alias("n_tokens"))
    )
    qtok = tok.where(F.col("term").isin(*terms))
    tf = qtok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df = qtok.groupBy("term").agg(F.countDistinct(id_col).alias("df"))

    avgdl = F.col("n_tokens") * 1.0 / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    term_score = F.round(
        idf
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl)),
        6,
    )
    return (
        tf.join(F.broadcast(df), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(n))
        .select(id_col, term_score.alias("term_score"))
        .groupBy(id_col)
        .agg(
            dsum("term_score").alias("bm25"),
            F.count(F.lit(1)).cast("int").alias("n_hit"),
        )
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(topk)
    )


# ---------------------------------------------------------------------------
# q_dedup_url — host-normalized URL dedup (public-suffix lite)
# ---------------------------------------------------------------------------
#
# The fixtures carry no URL column, so the query derives a deterministic
# pseudo-URL per document with the messiness real crawl URLs have —
# scheme case, www/m subdomains, default ports, tracking params,
# trailing slashes — such that every group of 5 consecutive doc_ids
# shares one canonical URL.  The NORMALIZATION (regex-only, restated
# verbatim in the oracle) is the operator; the synthesis just feeds it.

# Tracking-param removal is THREE prefix-explicit rules (applied in this
# order) rather than one [?&]-prefixed pattern plus a repair step:
#   1. every '&'-joined tracking param drops outright;
#   2. a LEADING tracking param followed by another param drops WITH its
#      joining '&', re-emitting the '?' it consumed;
#   3. a leading tracking param at end-of-string drops with its '?'.
# After rule 1 at most one tracking param remains and it is leading, so
# rules 2/3 are complete.  The earlier repair-step design ("promote the
# first bare '&' to '?'") rewrote LITERAL '&' in paths ('/a&b' is legal
# per RFC 3986) and broke idempotence for 'host:80&x=1' — both caught in
# review.
_TRACK = r"(utm_[a-z]+|ref)"
_TRACK_AMP_RE = rf"&{_TRACK}=[^&]*"
_TRACK_LEAD_MID_RE = rf"\?{_TRACK}=[^&]*&"
_TRACK_LEAD_END_RE = rf"\?{_TRACK}=[^&]*$"


def _url_col() -> F.Column:
    """Deterministic messy URL for a document: variant doc_id % 5 of the
    canonical https://site<g%10>.example.<tld>/doc/<g> where g =
    doc_id // 5 and tld is co.uk for g % 7 == 0 (exercising the
    public-suffix-lite branch), com otherwise."""
    g = (F.col("doc_id") / 5).cast("bigint")
    host = F.concat(
        F.lit("site"),
        (g % 10).cast("string"),
        F.lit(".example."),
        F.when(g % 7 == 0, F.lit("co.uk")).otherwise(F.lit("com")),
    )
    path = F.concat(F.lit("doc/"), g.cast("string"))
    v = (F.col("doc_id") % 5).cast("int")
    return (
        F.when(v == 0, F.concat(F.lit("https://www."), host, F.lit("/"), path))
        .when(v == 1, F.concat(F.lit("HTTP://"), host, F.lit("/"), path, F.lit("/")))
        .when(
            v == 2,
            F.concat(
                F.lit("https://"), host, F.lit(":443/"), path,
                F.lit("?utm_source=feed"),
            ),
        )
        .when(v == 3, F.concat(F.lit("http://m."), host, F.lit("/"), path))
        .otherwise(
            F.concat(
                F.lit("https://"), host, F.lit("/"), path,
                F.lit("?ref=rss&utm_campaign=x"),
            )
        )
    )


def normalize_url(url: F.Column) -> F.Column:
    """Canonical URL: lowercase, scheme stripped, www./m. subdomain
    stripped, default port stripped, tracking params (utm_*, ref)
    dropped, empty query and trailing slash removed.  Pure regex
    projection — zero-shuffle, codegen'd, restated verbatim in DuckDB
    (Spark regexp_replace replaces all occurrences; the DuckDB oracle
    passes the 'g' flag on every rule to match)."""
    c = F.lower(url)
    c = F.regexp_replace(c, r"^https?://", "")
    c = F.regexp_replace(c, r"^(www|m)\.", "")
    # [/?]|$ after the port: a default port directly followed by a query
    # string (host:80?x=y) must strip on the FIRST pass — with only /|$
    # it survived until tracking-param removal exposed the end-of-string,
    # breaking idempotence (caught by the hypothesis property test)
    c = F.regexp_replace(c, r"^([^/:]+):(80|443)([/?]|$)", r"$1$3")
    c = F.regexp_replace(c, _TRACK_AMP_RE, "")
    c = F.regexp_replace(c, _TRACK_LEAD_MID_RE, "?")
    c = F.regexp_replace(c, _TRACK_LEAD_END_RE, "")
    c = F.regexp_replace(c, r"\?$", "")
    c = F.regexp_replace(c, r"/$", "")
    return c


def registrable_domain(host: F.Column) -> F.Column:
    """Public-suffix lite: the registrable domain is the last two
    labels, or three when the suffix is multi-part (co.uk / com.au /
    co.jp here; a production deployment broadcasts the full public
    suffix list and the plan is identical)."""
    return F.when(
        host.rlike(r"\.(co\.uk|com\.au|co\.jp)$"),
        F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1),
    ).otherwise(F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1))


def normalize_url_sql(expr: str) -> str:
    """The DuckDB statement of ``normalize_url`` — one definition shared
    by the q_dedup_url oracle and the exhaustive cross-engine test, so
    the two restatements cannot drift."""
    return f"""regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                 lower({expr}),
                 '^https?://', '', 'g'),
                 '^(www|m)\\.', '', 'g'),
                 '^([^/:]+):(80|443)([/?]|$)', '\\1\\3', 'g'),
                 '{_TRACK_AMP_RE}', '', 'g'),
                 '{_TRACK_LEAD_MID_RE}', '?', 'g'),
                 '{_TRACK_LEAD_END_RE}', '', 'g'),
                 '\\?$', '', 'g'),
                 '/$', '', 'g')"""


@register(
    "q_dedup_url",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id,
             CASE CAST(doc_id % 5 AS INT)
               WHEN 0 THEN 'https://www.' || host || '/' || path
               WHEN 1 THEN 'HTTP://' || host || '/' || path || '/'
               WHEN 2 THEN 'https://' || host || ':443/' || path
                           || '?utm_source=feed'
               WHEN 3 THEN 'http://m.' || host || '/' || path
               ELSE 'https://' || host || '/' || path
                    || '?ref=rss&utm_campaign=x'
             END AS url
      FROM (
        SELECT doc_id,
               'site' || CAST((doc_id // 5) % 10 AS VARCHAR) || '.example.'
                 || CASE WHEN (doc_id // 5) % 7 = 0
                         THEN 'co.uk' ELSE 'com' END AS host,
               'doc/' || CAST(doc_id // 5 AS VARCHAR) AS path
        FROM documents)),
    canon AS (
      SELECT doc_id,
             {normalize_url_sql('url')} AS canon_url
      FROM raw),
    dom AS (
      SELECT doc_id, canon_url,
             regexp_extract(canon_url, '^([^/]+)', 1) AS host
      FROM canon)
    SELECT canon_url,
           CASE WHEN regexp_matches(host, '\\.(co\\.uk|com\\.au|co\\.jp)$')
                THEN regexp_extract(host, '([^.]+\\.[^.]+\\.[^.]+)$', 1)
                ELSE regexp_extract(host, '([^.]+\\.[^.]+)$', 1)
           END AS domain,
           CAST(COUNT(*) AS BIGINT) AS n_dups,
           MIN(doc_id) AS keep_doc_id
    FROM dom
    GROUP BY 1, 2
    ORDER BY canon_url
    """,
    tags=("llm", "dedup", "curation"),
)
def q_dedup_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-normalized URL dedup — the first pass over any crawl-derived
    corpus: canonicalize each document's URL (scheme/case/www/port/
    tracking-param/trailing-slash normalization, all regex projections)
    and collapse to one row per canonical URL with the duplicate count
    and the kept doc (min doc_id — the crawl-order winner).

    Plan shape: zero-shuffle normalization (codegen'd regex chain on the
    scan) followed by ONE hash aggregate on the canonical key — at
    100 TB this is the cheapest dedup pass available, which is exactly
    why crawls run it before any content hashing.  The registrable
    domain (public-suffix lite) rides along as a grouping column so
    per-site rollups need no second pass."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", _url_col().alias("url"))
    canon = d.select("doc_id", normalize_url(F.col("url")).alias("canon_url"))
    host = F.regexp_extract(F.col("canon_url"), r"^([^/]+)", 1)
    return (
        canon.withColumn("domain", registrable_domain(host))
        .groupBy("canon_url", "domain")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_dups"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .orderBy("canon_url")
    )
