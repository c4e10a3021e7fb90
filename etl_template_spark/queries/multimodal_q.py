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


# The fake decoder's whole pipeline is digest arithmetic — fake pixels
# are the sha256 digest cycled to width*height*3 bytes with (w, h)
# drawn from the first two digest bytes, and the feature is a byte
# histogram over the first 4096 pixels — so the oracle can restate it
# from sha256(text)'s hex: byte i of the pixel stream is hex pair
# (i mod 32) of the digest.
_FEATURES_ORACLE = """
WITH d AS (
  -- COALESCE mirrors the engine's `content or b""`: a NULL text still
  -- decodes (digest of the empty string) and emits a feature row;
  -- sha256(NULL) would instead null the width math and silently DROP
  -- the row via unnest(range(0, NULL)) (r5 ADVICE)
  SELECT doc_id AS media_id, sha256(COALESCE(text, '')) AS hx FROM documents),
p AS (
  SELECT media_id, hx,
         16 + CAST(concat('0x', substr(hx, 1, 2)) AS INT) % 64 AS w,
         16 + CAST(concat('0x', substr(hx, 3, 2)) AS INT) % 64 AS h
  FROM d),
k AS (SELECT media_id, hx, least(4096, w * h * 3) AS kk FROM p),
ex AS (
  SELECT media_id, hx, kk, unnest(range(0, kk)) AS i FROM k),
b AS (
  SELECT media_id, kk,
         CAST(concat('0x',
              substr(hx, 2 * (CAST(i AS INT) % 32) + 1, 2)) AS INT) % 8
           AS bucket
  FROM ex)
SELECT media_id,
       CAST(8 AS INT) AS feat_dim,
       -- the engine stores features as float32 (array<float>, the
       -- production vision-feature width): the REAL cast reproduces
       -- that rounding before widening back to double
       CAST(CAST(
         CAST(SUM(CASE WHEN bucket = 0 THEN 1 ELSE 0 END) AS DOUBLE) / kk
       AS REAL) AS DOUBLE) AS f0
FROM b
GROUP BY media_id, kk
ORDER BY media_id
"""


@register(
    "q_multimodal_features", oracle=_FEATURES_ORACLE, tags=("multimodal", "udf")
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary → fixed-width feature vectors through mapInPandas Arrow
    batches (the production vision-encoder plumbing, deterministic fake
    decoder).  The fake decode derives everything from the content's
    sha256 digest, so the ORACLE recomputes the identical feature from
    sha256(text) hex arithmetic — the Arrow batch path (schema, batch
    boundaries, per-row feature extraction) is hash-checked end-to-end,
    not merely rows-counted; real codecs still inject through the same
    seam (multimodal.py)."""
    media = _media_frame(spark, sf_dir)
    feats = extract_image_features(media, decoder=fake_decode)
    # f0 is emitted UN-rounded: count/K is one IEEE division of exact
    # integers, bit-identical across engines, while round-to-6 can land
    # on a half-way boundary where Spark's HALF_UP and DuckDB disagree
    # (observed at sf0.001: 0.187909 vs 0.187908).  Features travel as
    # float32 (the production width); the oracle reproduces that with a
    # REAL cast before widening.
    return feats.select(
        "media_id",
        "feat_dim",
        F.element_at("feat", 1).cast("double").alias("f0"),
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
