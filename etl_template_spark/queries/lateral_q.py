"""LATERAL join surface (SURVEY.md §7 phase-7): correlated lateral
subqueries beyond the UDTF/explode case (udfs.py covers LATERAL VIEW).

The interesting part is what Catalyst DOES with it: a correlated
``LATERAL (... ORDER BY ... LIMIT k)`` is decorrelated into a join
against a per-key top-k computed ONCE under WindowGroupLimit — verified
via .explain: no per-outer-row re-execution, no nested loop.  That
rewrite is why the shape survives 100 TB: the lateral subquery's cost
is one windowed pass over the inner table, not |outer| passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..registry import register

_K = 3


@register(
    "q_lateral_topk",
    oracle=f"""
    SELECT n.n_name, t.c_custkey, t.c_name, t.c_acctbal,
           CAST(t.rnk AS INT) AS rnk
    FROM nation n,
    LATERAL (
      SELECT c_custkey, c_name, c_acctbal,
             ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rnk
      FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT {_K}
    ) t
    ORDER BY n.n_name, rnk
    """,
    tags=("sql", "join", "topk"),
)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k-per-outer-row via a correlated LATERAL subquery: for every
    nation, its 3 highest-balance customers — the 'for each entity, the
    best k of its children' shape written the way an analyst writes it.

    Catalyst decorrelates this into customer-side row_number under
    WindowGroupLimit joined back to nation — identical physical work to
    the hand-built q_topk_per_group, proving the declarative form costs
    nothing: per-group state stays at k, there is no nested-loop
    re-execution of the subquery per nation, and both engines agree on
    the row set (rank ties broken by c_custkey for determinism)."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("lat_nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("lat_customer")
    return spark.sql(
        f"""
        SELECT n.n_name, t.c_custkey, t.c_name, t.c_acctbal, t.rnk
        FROM lat_nation n,
        LATERAL (
          SELECT c_custkey, c_name, c_acctbal,
                 ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rnk
          FROM lat_customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey
          LIMIT {_K}
        ) t
        """
    )


@register(
    "q_lateral_outer",
    oracle="""
    SELECT d.doc_id, t.hit
    FROM documents d
    LEFT JOIN LATERAL (
      SELECT unnest(list_filter(string_split(d.text, ' '),
                                tok -> tok = 'dup')) AS hit
    ) t ON TRUE
    ORDER BY doc_id, hit
    """,
    tags=("sql", "udtf", "edge"),
)
def q_lateral_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW OUTER: one-to-many expansion that PRESERVES rows
    whose expansion is empty — each document explodes into its
    occurrences of the rare token 'dup', and documents with none (the
    overwhelming majority) survive as a single NULL-hit row instead of
    vanishing.  The inner LATERAL VIEW (udfs.py) silently DROPS such
    rows; for audit joins ("every document must appear exactly once or
    per-hit") the OUTER variant is the correct tool and the difference
    is invisible until a row goes missing downstream.

    Edge semantics pinned by the oracle: a NULL text behaves like an
    empty expansion in BOTH engines (Spark: explode_outer(NULL) keeps
    the row; DuckDB: unnest(NULL) yields no rows and the LEFT LATERAL
    join keeps it).  Plan shape: Generate(outer=true) directly over the
    scan — a zero-shuffle projection at any scale."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("lat_docs")
    return spark.sql(
        """
        SELECT doc_id, hit
        FROM lat_docs
        LATERAL VIEW OUTER explode(
          filter(split(text, ' '), tok -> tok = 'dup')
        ) AS hit
        """
    )
