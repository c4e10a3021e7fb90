"""UDF surface (SURVEY.md §2B: q_udf_pandas, q_udaf_pandas,
q_udf_apply_in_pandas, q_udtf_explode, q_udtf_mapinpandas).

This is the engine's generalization of the reference's typed per-record
callbacks (``CreateTransformer``/``CreateLoader``,
/root/reference/tools/tools.go:841-884).  Where the reference invokes a
Go closure per record, the engine moves data to Python in Arrow batches
(pandas_udf / applyInPandas / mapInPandas) — 10-100× the throughput of
row-at-a-time UDFs, and the ONLY sanctioned way to run Python in the
row loop.  Everything SQL-expressible stays in functions_scalar.py.

Determinism discipline for the oracle hash: UDF bodies use only
operations that are exact or order-independent (integral sums, min/max,
elementwise IEEE arithmetic) — a UDAF that averages floats in shuffle
order would be nondeterministic at any scale, which is a bug, not just
a test problem.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..io import load_table
from ..registry import register

# NOTE: no module-level @pandas_udf decorators.  The decorator resolves its
# return type eagerly, which (a) requires a live SparkSession at import time
# and (b) re-fires inside Python workers when cloudpickle re-imports this
# module to unpickle a sibling function.  Plain functions stay module-level;
# pandas_udf(...) wrapping happens inside each builder.


def _credit_score_fn(acctbal: pd.Series, name: pd.Series) -> pd.Series:
    # Arbitrary Python logic stand-in: elementwise IEEE ops only (exact).
    return acctbal * 0.01 + name.str.len().astype("float64")


def _norm_segment_fn(seg: pd.Series) -> pd.Series:
    return seg.str.lower().str.replace("machinery", "mech", regex=False)


@register(
    "q_udf_pandas",
    oracle="""
    SELECT
      c_custkey,
      c_acctbal * 0.01 + length(c_name)                     AS credit_score,
      replace(lower(c_mktsegment), 'machinery', 'mech')     AS segment_norm
    FROM customer
    ORDER BY c_custkey
    """,
    tags=("udf",),
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDFs (Arrow batches) — the R9 escape
    hatch for per-record logic Spark expressions can't state."""
    c = load_table(spark, sf_dir, "customer")
    credit_score = pandas_udf(_credit_score_fn, "double")
    norm_segment = pandas_udf(_norm_segment_fn, "string")
    return c.select(
        "c_custkey",
        credit_score("c_acctbal", "c_name").alias("credit_score"),
        norm_segment("c_mktsegment").alias("segment_norm"),
    )


def _qty_sum_fn(q: pd.Series) -> float:
    # Integral-valued doubles: sum is exact in any accumulation order.
    return float(q.sum())


def _qty_range_fn(q: pd.Series) -> float:
    return float(q.max() - q.min())


def _heavy_lines_fn(q: pd.Series) -> int:
    return int((q >= 40).sum())


@register(
    "q_udaf_pandas",
    oracle="""
    SELECT
      l_returnflag,
      SUM(l_quantity)                                   AS qty_sum,
      MAX(l_quantity) - MIN(l_quantity)                 AS qty_range,
      CAST(SUM(CASE WHEN l_quantity >= 40 THEN 1 ELSE 0 END) AS BIGINT) AS heavy_lines
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("udf", "agg"),
)
def q_udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDFs (one Arrow batch per group)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty_sum = pandas_udf(_qty_sum_fn, "double")
    qty_range = pandas_udf(_qty_range_fn, "double")
    heavy_lines = pandas_udf(_heavy_lines_fn, "long")
    return li.groupBy("l_returnflag").agg(
        qty_sum("l_quantity").alias("qty_sum"),
        qty_range("l_quantity").alias("qty_range"),
        heavy_lines("l_quantity").alias("heavy_lines"),
    )


def _minmax_scale(pdf: pd.DataFrame) -> pd.DataFrame:
    lo, hi = pdf["o_totalprice"].min(), pdf["o_totalprice"].max()
    span = hi - lo
    pdf = pdf.copy()
    # Elementwise (x-lo)/span: every term exact-deterministic doubles.
    pdf["price_scaled"] = 0.0 if span == 0 else (pdf["o_totalprice"] - lo) / span
    return pdf[["o_custkey", "o_orderkey", "o_totalprice", "price_scaled"]]


@register(
    "q_udf_apply_in_pandas",
    oracle="""
    SELECT
      o_custkey, o_orderkey, o_totalprice,
      CASE WHEN MAX(o_totalprice) OVER w = MIN(o_totalprice) OVER w THEN 0.0
           ELSE (o_totalprice - MIN(o_totalprice) OVER w)
                / (MAX(o_totalprice) OVER w - MIN(o_totalprice) OVER w)
      END AS price_scaled
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey)
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("udf",),
)
def q_udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group arbitrary pandas transform (applyInPandas): min-max
    scaling of order value within each customer.  The group is one
    in-memory pandas frame — fine for bounded groups; unbounded groups
    need the window formulation the oracle states."""
    o = load_table(spark, sf_dir, "orders")
    out_schema = "o_custkey long, o_orderkey long, o_totalprice double, price_scaled double"
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .groupBy("o_custkey")
        .applyInPandas(_minmax_scale, schema=out_schema)
    )


@register(
    "q_udtf_explode",
    oracle="""
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    WHERE length(token) > 5
    GROUP BY token
    ORDER BY token
    """,
    tags=("udf", "text"),
)
def q_udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row→many (UDTF shape) via explode: documents → tokens →
    frequency. Stays JVM-side — explode needs no Python at all."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ", -1)).alias("token"))
        .where(F.length("token") > 5)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _doc_metrics(batches):
    for pdf in batches:
        toks = pdf["text"].str.split(" ")
        yield pd.DataFrame(
            {
                "doc_id": pd.concat([pdf["doc_id"], pdf["doc_id"]]),
                "metric": ["n_tokens"] * len(pdf) + ["n_chars"] * len(pdf),
                "value": pd.concat(
                    [toks.map(len).astype("int64"), pdf["text"].str.len().astype("int64")]
                ),
            }
        )


@register(
    "q_udtf_mapinpandas",
    oracle="""
    SELECT doc_id, 'n_tokens' AS metric,
           CAST(length(string_split(text, ' ')) AS BIGINT) AS value
    FROM documents
    UNION ALL
    SELECT doc_id, 'n_chars' AS metric, CAST(length(text) AS BIGINT) AS value
    FROM documents
    ORDER BY doc_id, metric
    """,
    tags=("udf", "text"),
)
def q_udtf_mapinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary flat-map over Arrow batches (mapInPandas): each document
    emits one row per metric — the fully-general UDTF shape."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "text").mapInPandas(
        _doc_metrics, schema="doc_id long, metric string, value long"
    )


@register(
    "q_udtf_python",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    e AS (SELECT doc_id, toks,
                 unnest(generate_series(1, len(toks))) AS i FROM t)
    SELECT doc_id, CAST(i - 1 AS INT) AS pos, toks[i] AS token
    FROM e
    WHERE length(toks[i]) > 7
    ORDER BY doc_id, pos
    """,
    tags=("udf", "text"),
)
def q_udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL Python UDTF (Spark 4 ``@udtf`` table function) applied per
    row via SQL LATERAL: each document yields one row per long token
    with its position.

    Coverage-of-API query: the same semantics stay JVM-side as
    ``posexplode(split(...))`` (q_udtf_explode is the scale path);
    ``@udtf(useArrow=True)`` keeps the Python path on Arrow batches
    rather than pickled rows when a table function genuinely needs
    Python.  The UDTF class is created inside the builder — module
    import stays session-free (round-1 udfs.py import-time lesson)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, token string", useArrow=True)
    class LongTokens:
        def eval(self, doc_id, text):
            for i, t in enumerate(text.split(" ")):
                if len(t) > 7:
                    yield doc_id, i, t

    spark.udtf.register("long_tokens", LongTokens)
    d = load_table(spark, sf_dir, "documents")
    d.select("doc_id", "text").createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        "SELECT t.doc_id, t.pos, t.token "
        "FROM __udtf_docs, LATERAL long_tokens(doc_id, text) t"
    )
