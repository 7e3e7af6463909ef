"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata structs; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs over
``mapInPandas``.

Codec status (round 3 — real codecs, no external libs):
- **images** (PNG / BMP / PPM / PGM) and **audio** (PCM WAV) are REALLY
  decoded by ``kgx_spark.functions.codecs`` — self-contained stdlib+numpy
  implementations of the public formats; features come from actual pixels /
  samples and resize is a real nearest-neighbor resample re-encoded as PNG.
- **video** containers genuinely require ffmpeg (not in this container):
  video decode falls back to the deterministic md5 stub (``_decode_stub``),
  clearly marked; frame_sample stays metadata-only math (real).
- unrecognized byte formats also fall back to the stub rather than erroring,
  so a mixed-quality 100 TB corpus doesn't kill the job on one bad blob.

Scale notes: media bytes dominate row size, so these stages
(a) never shuffle the binary column (all transforms are narrow maps),
(b) project metadata-only DataFrames before any join/groupBy.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def _decode_stub(content: bytes | None) -> list[float] | None:
    """Deterministic fake 'decode + feature extract' — the FALLBACK for
    formats the real codecs don't cover (video containers need ffmpeg, which
    is not installed here; unknown blobs shouldn't kill a 100 TB job). The
    fake hashes the bytes into FEATURE_DIM floats in [0, 1) so downstream
    plumbing stays exercisable and reproducible for those rows too.
    """
    if content is None:
        return None
    h = hashlib.md5(content).digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def _decode_features(content: bytes | None) -> list[float] | None:
    """REAL decode + feature extraction for supported formats
    (functions/codecs.py: PNG/BMP/PPM/PGM pixels, PCM WAV samples);
    deterministic stub fallback otherwise."""
    from kgx_spark.functions import codecs

    if content is None:
        return None
    fmt = codecs.sniff_format(bytes(content))
    try:
        if fmt == "png":
            return codecs.image_features(codecs.decode_png(bytes(content)), FEATURE_DIM)
        if fmt == "bmp":
            return codecs.image_features(codecs.decode_bmp(bytes(content)), FEATURE_DIM)
        if fmt in ("ppm", "pgm"):
            return codecs.image_features(codecs.decode_ppm(bytes(content)), FEATURE_DIM)
        if fmt == "wav":
            return codecs.audio_features(*codecs.decode_wav(bytes(content)), dim=FEATURE_DIM)
    except Exception:  # malformed media → fallback, never a job kill
        pass
    return _decode_stub(content)


def decode_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """media → (media_id, kind, feature: array<float>) via mapInPandas.

    The iterator-of-batches shape is the real production plumbing: each Arrow
    batch holds ``spark.sql.execution.arrow.maxRecordsPerBatch`` rows, so
    decoding is amortized per batch and memory stays bounded even with large
    blobs.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("feature", T.ArrayType(T.FloatType()), True),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": pdf["content"].map(_decode_features),
                }
            )

    return media.select("media_id", "kind", "content").mapInPandas(fn, out_schema)


def _resize_stub(content: bytes | None, width: int, height: int) -> bytes | None:
    """Deterministic fake 'resize' — fallback for non-decodable formats (the
    md5 chain re-keys the bytes to a w×h-proportional budget so size
    accounting and idempotence stay exercisable)."""
    if content is None:
        return None
    budget = max(16, min(width * height // 64, 4096))
    out = bytearray()
    block = hashlib.md5(content + f"{width}x{height}".encode()).digest()
    while len(out) < budget:
        out.extend(block)
        block = hashlib.md5(block).digest()
    return bytes(out[:budget])


def _resize_real(content: bytes | None, width: int, height: int) -> bytes | None:
    """REAL resize for decodable images: decode (PNG/BMP/PPM/PGM) →
    nearest-neighbor resample → re-encode as PNG (the canonical thumbnail
    format; deterministic filter-0 encode). Falls back to the stub for
    formats the codecs don't cover."""
    from kgx_spark.functions import codecs

    if content is None:
        return None
    b = bytes(content)
    fmt = codecs.sniff_format(b)
    try:
        if fmt == "png":
            px = codecs.decode_png(b)
        elif fmt == "bmp":
            px = codecs.decode_bmp(b)
        elif fmt in ("ppm", "pgm"):
            px = codecs.decode_ppm(b)
        else:
            return _resize_stub(content, width, height)
        return codecs.encode_png(codecs.resize_nearest(px, width, height))
    except Exception:
        return _resize_stub(content, width, height)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """image rows → resized content + updated meta via mapInPandas
    (same iterator-of-Arrow-batches plumbing as decode_features)."""
    out_schema = media.schema

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            is_img = pdf["kind"] == "image"
            pdf = pdf.copy()
            pdf.loc[is_img, "content"] = pdf.loc[is_img, "content"].map(
                lambda b: _resize_real(b, width, height)
            )
            pdf["meta"] = pdf.apply(
                lambda r: {**(r["meta"] or {}), "width": width, "height": height}
                if r["kind"] == "image" else r["meta"],
                axis=1,
            )
            yield pdf

    return media.mapInPandas(fn, out_schema)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """video rows → (media_id, frame_ts_ms) sample plan — pure column math on
    metadata (no decode): one row per sampled frame."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.coalesce(F.col("meta.duration_ms"), F.lit(0)), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregation (never touches content bytes)."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum(F.length("content")).alias("total_bytes"),
    )
