"""Semantic dedup (round 7): embedding near-dup detection blocked by the
IVF coarse quantizer's cell assignment — the real ANN-bucket blocking
story q_dedup_embedding's docstring promises ("at corpus scale the
blocking key is an LSH bucket or a cluster id", SURVEY §2B).

This is the SemDeDup shape (Abbas et al. 2023, arXiv:2303.09540):
k-means-cluster the embedding space, then look for near-duplicates only
WITHIN each cluster — cosine-close vectors land in the same Voronoi
cell, so cross-cell pairs can be skipped wholesale.  The engine composes
two operators it already proves correct separately: the IVF quantizer
(similarity.py: deterministic seeds + one decimal-exact Lloyd
refinement, hash-checked since round 6) supplies the blocking key, and
the salted block join (operators/topk.py) enumerates in-cell pairs
without letting a hot cell serialize one quadratic partition.

Resolution is keep-first (the SemDeDup policy): within a cell, a vector
drops iff some SMALLER-id vector in the same cell is cosine-similar
above the threshold.  One pass, no iteration — unlike connected
components (q_dedup_cluster) the decision needs only the pair list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..compat import davg_sql
from ..caching import persist_tracked
from ..io import load_table
from ..operators.topk import salted_block_join
from ..registry import register
from .similarity import (
    _DIM,
    _IVF_CELLS,
    _assign_cells,
    _cos_sql,
    _ivf_centroids,
    cosine_col,
)

_SEM_THRESHOLD = 0.35  # in-cell cosine at/above this = semantic duplicate
# (0.35 drops ~17% of the sf0.01 fixture — high enough to exercise the
# keep-first resolution on real pair volume; 0.5 dropped a single row)


def _semdedup_oracle() -> str:
    """The full pipeline restated declaratively: IVF build (seeds →
    argmax assign → decimal-exact Lloyd means → re-assign, identical
    text to the q_sim_search_ivf oracle's index half) → in-cell
    smaller-id near-dup pairs → keep-first verdict per vector."""
    return f"""
    WITH seeds AS (
      SELECT vec_id AS cell, embedding AS centroid
      FROM embeddings WHERE vec_id < {_IVF_CELLS}),
    a1 AS (
      SELECT e.vec_id, e.embedding, s.cell,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_cos_sql('e.embedding', 's.centroid')} DESC, s.cell
             ) AS rn
      FROM embeddings e CROSS JOIN seeds s),
    asg AS (SELECT vec_id, embedding, cell FROM a1 WHERE rn = 1),
    means AS (
      SELECT cell, i.range AS pos,
             {davg_sql('CAST(embedding[i.range] AS DOUBLE)')} AS m
      FROM asg CROSS JOIN range(1, {_DIM + 1}) i
      GROUP BY cell, i.range),
    cents AS (
      SELECT cell, list(m ORDER BY pos) AS centroid FROM means GROUP BY cell),
    a2 AS (
      SELECT e.vec_id, e.label, e.embedding, c.cell,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_cos_sql('e.embedding', 'c.centroid')} DESC, c.cell
             ) AS rn
      FROM embeddings e CROSS JOIN cents c),
    corpus AS (
      SELECT vec_id, label, embedding, cell FROM a2 WHERE rn = 1),
    dup AS (
      SELECT DISTINCT b.vec_id AS v2
      FROM corpus a JOIN corpus b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE {_cos_sql('a.embedding', 'b.embedding')} >= {_SEM_THRESHOLD})
    SELECT c.vec_id, c.label, CAST(c.cell AS BIGINT) AS cell,
           dup.v2 IS NULL AS kept
    FROM corpus c LEFT JOIN dup ON c.vec_id = dup.v2
    ORDER BY c.vec_id
    """


@register(
    "q_dedup_semantic",
    oracle=_semdedup_oracle(),
    tags=("llm", "similarity", "dedup", "approx"),
)
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-scale semantic dedup: every vector gets the IVF cell of
    its nearest (decimal-exact) Lloyd centroid as its blocking key, and
    drops iff a smaller-id vector in the SAME cell is cosine-similar
    at or above the 0.35 threshold (keep-first, per SemDeDup).  Output is
    the full per-vector verdict table (vec_id, label, cell, kept).

    Plan shape, and why it holds at 100 TB: the quantizer build is two
    broadcast-assign passes plus a posexplode/groupBy Lloyd mean —
    centroids stay a k-row broadcast table, the corpus never shuffles
    for assignment (argmax is a partial-combining hash agg).  Pair
    enumeration is the salted block join on the CELL id: each cell
    splits into 8 deterministic sub-blocks so a hot cell fans out
    instead of serializing, in-cell pairs only, never all-pairs — at
    production scale k grows with the corpus (~sqrt(N) cells) keeping
    cells bounded.  The verdict is one anti-join-shaped left join of the
    corpus against the bounded duplicate-id set.

    Approximate as RETRIEVAL (cross-cell near-dups are missed — the
    SemDeDup trade), but fully deterministic as COMPUTATION: the whole
    pipeline (quantizer, assignment tiebreaks, rounded cosine, verdict)
    is restated verbatim in the DuckDB oracle and hash-checked."""
    e = load_table(spark, sf_dir, "embeddings")
    cents = _ivf_centroids(e)
    # the assignment feeds both pair-join sides AND the final verdict
    # join — without a persist each consumer re-runs the quantizer
    # build + broadcast assignment over the corpus (3x)
    assigned = _assign_cells(e, cents, n=1)  # vec_id, label, embedding, cell
    assigned = persist_tracked(assigned)
    a = assigned.select(
        "cell", F.col("vec_id").alias("v1"), F.col("embedding").alias("emb1")
    )
    b = assigned.select(
        "cell", F.col("vec_id").alias("v2"), F.col("embedding").alias("emb2")
    )
    dup = (
        salted_block_join(a, b, "cell", "v2")
        .where(F.col("v1") < F.col("v2"))
        .where(cosine_col("emb1", "emb2") >= _SEM_THRESHOLD)
        .select("v2")
        .distinct()
    )
    return (
        assigned.join(dup, assigned["vec_id"] == dup["v2"], "left")
        .select(
            "vec_id",
            "label",
            F.col("cell").cast("bigint").alias("cell"),
            F.col("v2").isNull().alias("kept"),
        )
        .orderBy("vec_id")
    )
