"""Multimodal query surface (rows-only checks — the decode path is a
deterministic fake, see multimodal.py: real codecs are injected).

Register the binary-column plumbing as first-class queries so the
correctness harness exercises the Arrow binary path every round: the
documents' text bytes stand in for media content (no binary fixture
table exists), flowing through the exact schema/batch contracts a real
image pipeline uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..multimodal import attach_media_meta, extract_image_features, fake_decode
from ..registry import register


def _media_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("fake").alias("fmt"),
        F.encode("text", "UTF-8").alias("content"),
    )


@register("q_multimodal_meta", oracle="""
    SELECT doc_id AS media_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           sha256(text)                 AS sha256
    FROM documents
    ORDER BY media_id
    """, tags=("multimodal",))
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec-free media metadata (size + digest) — JVM-side over the
    binary column, SQL-checkable because ascii text bytes == the text."""
    media = _media_frame(spark, sf_dir)
    return attach_media_meta(media, "media_id").select("media_id", "n_bytes", "sha256")


@register("q_multimodal_features", oracle=None, tags=("multimodal", "udf"))
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary → fixed-width feature vectors through mapInPandas Arrow
    batches (the production vision-encoder plumbing, deterministic fake
    decoder).  Rows-only check: one feature row per media row, fixed
    dim; determinism is unit-tested (tests/test_multimodal.py)."""
    media = _media_frame(spark, sf_dir)
    feats = extract_image_features(media, decoder=fake_decode)
    return feats.select(
        "media_id",
        "feat_dim",
        F.round(F.element_at("feat", 1).cast("double"), 6).alias("f0"),
    )


@register(
    "q_multimodal_frames",
    oracle="""
    WITH t AS (SELECT doc_id AS media_id, text FROM documents),
    e AS (
      SELECT media_id, text,
             unnest(range(0, CAST(ceil(length(text) / 1024.0) AS INT))) AS i
      FROM t)
    SELECT media_id,
           CAST(i AS INT)                 AS frame_no,
           substr(text, i * 1024 + 1, 64) AS frame_str
    FROM e
    ORDER BY media_id, frame_no
    """,
    tags=("multimodal", "udf"),
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Video' frame sampling (multimodal.py::sample_frames): one media
    row explodes to fixed-stride frame rows through mapInPandas Arrow
    batches — the demuxer contract with a byte-window stand-in.  The
    fixture media bytes are ASCII text, so the frame bytes decode
    losslessly to strings and the whole one-to-many binary pipeline is
    SQL-checkable (a rarity for the multimodal family — the other
    queries settle for rows-only)."""
    from ..multimodal import sample_frames

    media = _media_frame(spark, sf_dir)
    frames = sample_frames(media, every_n_bytes=1024, frame_bytes=64)
    return frames.select(
        "media_id",
        "frame_no",
        F.col("frame").cast("string").alias("frame_str"),
    )
