"""q_rank_metrics — ranking-quality evaluation (nDCG@10 / MRR /
recall@10) over a multi-query BM25 run, as a registered, oracle-backed
query (r7 VERDICT directive #3; operator built + unit-tested in r7 at
operators/relevance.py).

This closes the retrieval family's eval loop: q_index_inverted builds
the index, q_bm25_rank scores one query, and this query SCORES THE
SCORER — three fixed retrieval queries are ranked by Okapi BM25 in one
corpus pass, judged against deterministic graded qrels, and reduced to
per-query metrics.

The run is a MULTI-QUERY BM25: the (query_id, term) table joins the
token stream once, so tf/df/score aggregate a |Q·terms|-bounded slice
of the corpus — a thousand-query eval costs one corpus scan plus
work linear in matches, not a thousand scans (the batch-eval shape
retrieval.py's single-query operator deliberately doesn't cover).
Formulas and float discipline are bm25_rank's, verbatim (Lucene
never-negative idf, k1=1.2, b=0.75, per-term round-6, decimal-exact
per-doc sums; see retrieval.py:94 for the cross-engine cast analysis).

The qrels are graded by distinct-query-term coverage (rel = how many of
the query's terms the document contains, 1..3) — deterministic,
derivable by both engines, and deliberately NOT the ranking key: BM25
orders by saturated tf·idf with length normalization, so the run is an
imperfect ranking of the qrels and the metrics land strictly inside
(0, 1) — a constant-1 metric column would be a vacuous oracle.

Scale shape of the metrics themselves (operators/relevance.py): one
equi-join run⋈qrels on (query_id, doc_id), windows partitioned by
query (bounded partitions), decimal-exact gain sums — nothing
corpus-global, so a million-query eval scales like ten.

Reference parity: the reference has no retrieval or evaluation surface
(tools.go is scan/map/count/checkpoint) — declared engine surface
beyond the reference, per SURVEY §2B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..compat import dsum, dsum_sql
from ..io import load_table
from ..operators.dedup import tokens_col
from ..operators.relevance import rank_metrics
from ..registry import register

_QUERIES: dict[int, tuple[str, ...]] = {
    1: ("spark", "window", "dup"),
    2: ("join", "hash", "merge"),
    3: ("stream", "batch"),
}
_K1 = 1.2
_B = 0.75
_TOPK = 20  # run depth per query
_K = 10  # metrics cutoff


def _rank_metrics_oracle() -> str:
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, ts in _QUERIES.items() for t in ts
    )
    score = (
        f"round(ln((n.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) * "
        f"(tf.tf * (({_K1} + 1.0)::DOUBLE)) / "
        f"(tf.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / "
        f"(n.n_tokens * 1.0 / n.n_docs))), 6)"
    )
    gain = (
        "(power(2.0::DOUBLE, rel) - 1.0::DOUBLE)"
        " / log2(CAST(rank AS DOUBLE) + 1.0::DOUBLE)"
    )
    igain = (
        "(power(2.0::DOUBLE, rel) - 1.0::DOUBLE)"
        " / log2(CAST(irank AS DOUBLE) + 1.0::DOUBLE)"
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    qterms(query_id, term) AS (VALUES {vals}),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    n AS (
      SELECT COUNT(*) AS n_docs,
             (SELECT COUNT(*) FROM tok) AS n_tokens
      FROM documents),
    qtok AS (
      SELECT q.query_id, t.doc_id, t.term
      FROM tok t JOIN qterms q USING (term)),
    tf AS (SELECT query_id, doc_id, term, COUNT(*) AS tf
           FROM qtok GROUP BY 1, 2, 3),
    df AS (SELECT query_id, term, COUNT(DISTINCT doc_id) AS df
           FROM qtok GROUP BY 1, 2),
    scored AS (
      SELECT tf.query_id, tf.doc_id, {score} AS term_score
      FROM tf
      JOIN df ON tf.query_id = df.query_id AND tf.term = df.term
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN n),
    agg AS (
      SELECT query_id, doc_id, {dsum_sql('term_score')} AS bm25
      FROM scored GROUP BY 1, 2),
    run AS (
      SELECT query_id, doc_id,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS INT)
               AS rank
      FROM agg
      QUALIFY rank <= {_TOPK}),
    qrels AS (
      SELECT query_id, doc_id, CAST(COUNT(DISTINCT term) AS INT) AS rel
      FROM qtok GROUP BY 1, 2),
    hits AS (
      SELECT r.query_id, r.rank, q.rel
      FROM run r JOIN qrels q
        ON r.query_id = q.query_id AND r.doc_id = q.doc_id
      WHERE r.rank <= {_K}),
    per_q AS (
      SELECT query_id,
             {dsum_sql(gain)} AS dcg,
             MIN(CASE WHEN rel > 0 THEN rank END) AS first_rel_rank,
             SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS rel_retrieved
      FROM hits GROUP BY 1),
    ideal AS (
      SELECT query_id, {dsum_sql(igain)} AS idcg
      FROM (
        SELECT query_id, rel,
               row_number() OVER (
                 PARTITION BY query_id ORDER BY rel DESC, doc_id) AS irank
        FROM qrels)
      WHERE irank <= {_K}
      GROUP BY 1),
    n_rel AS (
      SELECT query_id, COUNT(*) AS n_rel FROM qrels WHERE rel > 0 GROUP BY 1),
    n_ret AS (
      SELECT query_id, COUNT(*) AS n_retrieved FROM run
      WHERE rank <= {_K} GROUP BY 1)
    SELECT i.query_id,
           CASE WHEN i.idcg > 0
                THEN round(COALESCE(p.dcg, 0.0::DOUBLE) / i.idcg, 6)
                ELSE 0.0::DOUBLE END AS ndcg,
           CASE WHEN p.first_rel_rank IS NOT NULL
                THEN round(1.0::DOUBLE / p.first_rel_rank, 6)
                ELSE 0.0::DOUBLE END AS mrr,
           CASE WHEN COALESCE(r.n_rel, 0) > 0
                THEN round(COALESCE(p.rel_retrieved, 0) * 1.0::DOUBLE
                           / r.n_rel, 6)
                ELSE 0.0::DOUBLE END AS recall,
           COALESCE(r.n_rel, 0) AS n_rel,
           COALESCE(t.n_retrieved, 0) AS n_retrieved
    FROM ideal i
    LEFT JOIN per_q p ON i.query_id = p.query_id
    LEFT JOIN n_rel r ON i.query_id = r.query_id
    LEFT JOIN n_ret t ON i.query_id = t.query_id
    """


@register("q_rank_metrics", oracle=_rank_metrics_oracle(), tags=("llm", "retrieval", "eval"))
def q_rank_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 / MRR / recall@10 for three BM25-ranked retrieval
    queries against distinct-term-coverage qrels — one row per query.

    One corpus pass builds the token stream; the (query_id, term) dim
    is a broadcast literal; everything downstream aggregates only
    matching (query, doc) pairs."""
    d = load_table(spark, sf_dir, "documents")
    qterms = spark.createDataFrame(
        [(qid, t) for qid, ts in _QUERIES.items() for t in ts],
        "query_id int, term string",
    )

    # r13 optimization: the old shape derived one `tok` explode and fed
    # it to FIVE lazy consumers (dl, n_tokens, and qtok's three), so
    # the corpus was re-exploded per consumer — 26 parquet scans and 41
    # exchanges in the plan.  dl and n_tokens never needed the explode
    # at all (`size(tokens)` is the exploded per-doc count, summed for
    # the total — map-only), and the ONE remaining explode-join output,
    # the |Q·terms|-bounded match table, is persisted for its three
    # aggregating consumers.  4 scans, 10 exchanges, identical rows.
    from ..caching import persist_tracked

    dl = d.select(
        "doc_id", F.size(tokens_col("text")).alias("dl")
    ).where(F.col("dl").isNotNull())
    totals = d.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        d.agg(F.sum(F.size(tokens_col("text"))).alias("n_tokens"))
    )
    qtok = persist_tracked(
        d.select("doc_id", F.explode(tokens_col("text")).alias("term"))
        .join(F.broadcast(qterms), "term")
        .select("query_id", "doc_id", "term")
    )
    tf = qtok.groupBy("query_id", "doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_ = qtok.groupBy("query_id", "term").agg(
        F.count_distinct("doc_id").alias("df")
    )
    # bm25_rank's exact expression tree (retrieval.py): idf never
    # negative, (k1+1) pre-promoted to double, per-term round-6
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    avgdl = F.col("n_tokens") * F.lit(1.0) / F.col("n_docs")
    term_score = F.round(
        idf
        * (F.col("tf") * F.lit(_K1 + 1.0))
        / (
            F.col("tf")
            + F.lit(_K1) * (F.lit(1.0 - _B) + F.lit(_B) * F.col("dl") / avgdl)
        ),
        6,
    )
    scored = (
        tf.join(df_, ["query_id", "term"])
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(totals))
        .select("query_id", "doc_id", term_score.alias("term_score"))
    )
    agg = scored.groupBy("query_id", "doc_id").agg(
        dsum("term_score").alias("bm25")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("bm25").desc(), F.col("doc_id"))
    run = (
        agg.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= _TOPK)
        .select("query_id", "doc_id", "rank")
    )
    qrels = qtok.groupBy("query_id", "doc_id").agg(
        F.count_distinct("term").cast("int").alias("rel")
    )
    return rank_metrics(run, qrels, k=_K)
