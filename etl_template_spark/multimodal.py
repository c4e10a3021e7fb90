"""Multimodal (image/audio/video) column plumbing.

Design: media is an opaque ``binary`` column plus a typed metadata
struct — the layout every large-scale multimodal training pipeline uses
(media bytes never parse JVM-side; Spark shuffles/stores them opaquely,
and only Arrow-batched Python workers look inside).

    media: struct<
        media_id bigint, kind string, fmt string, n_bytes bigint,
        sha256 string, width int, height int, duration_ms int>
    content: binary

What is REAL here and tested: the schema contract, the Arrow batch path
(mapInPandas over binary columns), deterministic batch shapes,
partition sizing by byte budget, and the metadata extraction that needs
no codec (size/digest).  What is STUBBED: actual decode/resize/
frame-sampling — the image/audio libraries are not in this container,
so ``decode_image`` raises NotImplementedError unless handed an
injected decoder, and ``fake_decode`` provides the deterministic stand-
in the tests use.  The UDF signatures, schemas and plumbing are exactly
what a real libjpeg/ffmpeg-backed decoder would plug into.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_DDL = (
    "media_id bigint, kind string, fmt string, n_bytes bigint, sha256 string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA_DDL = "media_id bigint, feat array<float>, feat_dim int"
THUMB_SCHEMA_DDL = "media_id bigint, thumb binary, thumb_w int, thumb_h int"


def attach_media_meta(df: DataFrame, id_col: str, content_col: str = "content") -> DataFrame:
    """Codec-free metadata (size + digest) computed JVM-side — no Python
    round-trip for the columns every downstream filter wants first.
    ``id_col`` names the media key the metadata is understood to be
    keyed by; it is validated to exist (r10 review: it used to be
    silently ignored, so a wrong id column produced no error and a
    wrong assumption downstream) but not otherwise consumed — the
    output keeps every input column."""
    for c in (id_col, content_col):
        if c not in df.columns:
            raise ValueError(
                f"attach_media_meta: column {c!r} not in frame "
                f"(have: {df.columns})"
            )
    return df.withColumn("n_bytes", F.length(content_col).cast("bigint")).withColumn(
        "sha256", F.sha2(F.col(content_col), 256)
    )


def partition_by_byte_budget(
    df: DataFrame,
    bytes_col: str = "n_bytes",
    target_bytes: int = 128 * 1024 * 1024,
    total_bytes: int | None = None,
    balance: str = "roundrobin",
) -> DataFrame:
    """Repartition so each partition carries ~target_bytes of media.
    Media rows are KB-to-MB sized; sizing the partition COUNT by rows
    makes wildly uneven tasks — the count here is byte-derived.

    ``balance`` picks how rows are PLACED into those partitions
    (r10 review — the old docstring implied byte-balanced placement
    while doing round-robin):

    - ``"roundrobin"`` (default): one shuffle; partitions are
      byte-balanced in EXPECTATION only — a heavy-tailed corpus
      (thumbnails + occasional 100 MB videos) can land several heavy
      rows in one partition by chance.  Right when the size
      distribution is mild, because it moves the (large, binary) rows
      exactly once.
    - ``"packed"``: deterministic greedy packing — rows hash into
      parallel packing shards, each shard bins by a size-descending
      running byte total (window over the shard, no global sort), so
      every BIN holds ≤ target_bytes + one max row BY CONSTRUCTION;
      the (shard, bin) keys then range-partition into ~one-bin tasks
      (the range sampler may co-locate a couple of bins, so a task is
      bounded by a SMALL CONSTANT × target — versus round-robin's
      unbounded pileup of heavy rows).  Costs a SECOND full shuffle
      of the binary payload, so it is an explicit opt-in for
      heavy-tailed corpora where straggler/OOM cost exceeds a shuffle.

    Sizing needs ONE driver-side scalar (the corpus byte total).  By
    default one cheap global agg computes it — a driver-side scalar,
    not a banned data collect, but it does cost an extra job per call;
    callers that already know the total (dataset manifests record
    per-version byte counts at write time, and pipelines usually call
    this right after attach_media_meta + a counted write) pass it via
    ``total_bytes`` and pay nothing."""
    if total_bytes is None:
        total_bytes = df.agg(F.sum(bytes_col).alias("t")).collect()[0]["t"] or 0
    n_parts = max(1, int(total_bytes / target_bytes) + 1)
    if balance == "roundrobin":
        return df.repartition(n_parts)
    if balance != "packed":
        raise ValueError(f"balance must be 'roundrobin' or 'packed': {balance!r}")
    from pyspark.sql import Window

    n_shards = min(64, n_parts)
    # monotonically_increasing_id is partition-deterministic (a retried
    # task recomputes the same ids), unlike rand() — the repo-wide
    # retry-idempotence rule (operators/skew.py::with_salt)
    staged = df.withColumn("__mid", F.monotonically_increasing_id()).withColumn(
        "__shard", F.pmod(F.xxhash64(F.col("__mid")), F.lit(n_shards))
    )
    w = (
        Window.partitionBy("__shard")
        .orderBy(F.col(bytes_col).desc_nulls_last(), F.col("__mid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.coalesce(F.col(bytes_col), F.lit(0))).over(w)
    staged = staged.withColumn(
        "__bin", F.floor((cum - F.lit(1)) / F.lit(int(target_bytes)))
    )
    # range-partition count ≈ the number of (shard, bin) keys: each
    # shard contributes its full bins plus at most one partial, so
    # n_parts + n_shards covers the key count and keeps the sampler
    # from folding many bins into one task
    return staged.repartitionByRange(
        n_parts + n_shards, F.col("__shard"), F.col("__bin")
    ).drop("__mid", "__shard", "__bin")


# ---------------------------------------------------------------------------
# Decoders: injected callables; default raises (no codec libs in-container)
# ---------------------------------------------------------------------------


def decode_image(content: bytes, fmt: str):
    """STUB: real deployments inject a PIL/libjpeg decoder with the same
    signature (bytes, fmt) → (width, height, pixel_bytes)."""
    raise NotImplementedError(
        "no image codec in this environment — inject a decoder via "
        "extract_image_features(decoder=...) / make_thumbnails(decoder=...)"
    )


def fake_decode(content: bytes, fmt: str) -> tuple[int, int, bytes]:
    """Deterministic stand-in decoder: derives a fake (width, height,
    pixels) purely from the bytes' digest, so tests exercise the full
    Arrow path with stable results and no codec dependency."""
    digest = hashlib.sha256(content or b"").digest()
    width = 16 + digest[0] % 64
    height = 16 + digest[1] % 64
    pixels = (digest * ((width * height * 3) // len(digest) + 1))[: width * height * 3]
    return width, height, pixels


def extract_image_features(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    fmt_col: str = "fmt",
    n_features: int = 8,
    decoder: Callable[[bytes, str], tuple[int, int, bytes]] = decode_image,
) -> DataFrame:
    """binary → fixed-width float features via mapInPandas: bytes cross
    to Python in Arrow record batches (zero-copy for binary), each batch
    yields one feature row per media row.  The feature body here (byte-
    histogram moments over decoded pixels) stands in for a real vision
    encoder; the batch shape — bounded rows per Arrow batch, fixed
    output schema — is the production contract."""

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for mid, content, fmt in zip(pdf[id_col], pdf[content_col], pdf[fmt_col]):
                _w, _h, pixels = decoder(bytes(content or b""), fmt)
                buckets = [0.0] * n_features
                for i, byte in enumerate(pixels[:4096]):
                    buckets[byte % n_features] += 1.0
                total = sum(buckets) or 1.0
                ids.append(mid)
                feats.append([b / total for b in buckets])
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "feat": feats,
                    "feat_dim": pd.Series([n_features] * len(ids), dtype="int32"),
                }
            )

    return df.select(id_col, content_col, fmt_col).mapInPandas(
        _features, schema=FEATURE_SCHEMA_DDL
    )


def make_thumbnails(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    fmt_col: str = "fmt",
    max_side: int = 8,
    decoder: Callable[[bytes, str], tuple[int, int, bytes]] = decode_image,
) -> DataFrame:
    """binary → resized binary (thumbnail) via mapInPandas.  The resize
    is nearest-neighbor over whatever the decoder returned — with a real
    decoder injected this is an actual thumbnailer; with fake_decode it
    deterministically exercises binary-in/binary-out Arrow plumbing."""

    def _thumbs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content, fmt in zip(pdf[id_col], pdf[content_col], pdf[fmt_col]):
                w, h, pixels = decoder(bytes(content or b""), fmt)
                tw, th = min(w, max_side), min(h, max_side)
                out = bytearray()
                for y in range(th):
                    for x in range(tw):
                        sx, sy = x * w // tw, y * h // th
                        idx = (sy * w + sx) * 3
                        out += pixels[idx : idx + 3]
                rows.append((mid, bytes(out), tw, th))
            yield pd.DataFrame(
                rows, columns=["media_id", "thumb", "thumb_w", "thumb_h"]
            )

    return df.select(id_col, content_col, fmt_col).mapInPandas(
        _thumbs, schema=THUMB_SCHEMA_DDL
    )


def sample_frames(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    every_n_bytes: int = 1024,
    frame_bytes: int = 64,
) -> DataFrame:
    """'Video' frame sampling shape: one input row → many frame rows
    (UDTF over Arrow batches).  Without a real demuxer the frames are
    fixed-stride byte windows; the explode-shaped output contract
    (media_id, frame_no, frame binary) is what a real ffmpeg-backed
    sampler produces."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                data = bytes(content or b"")
                for i, off in enumerate(range(0, len(data), every_n_bytes)):
                    ids.append(mid)
                    nos.append(i)
                    frames.append(data[off : off + frame_bytes])
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(nos, dtype="int32"),
                    "frame": frames,
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        _frames, schema="media_id bigint, frame_no int, frame binary"
    )
