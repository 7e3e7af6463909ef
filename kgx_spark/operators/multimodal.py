"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata structs; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs over
``mapInPandas``. The actual codec work is STUBBED (no image/audio libs in
this container — see ``_decode_stub``): the stub is a deterministic fake that
derives "pixels"/"samples" from the md5 of the bytes, so the Spark-side
plumbing — schema, batching, partitioning, UDF signatures — is real and
tested, and swapping in PIL/ffmpeg later changes one function.

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
    """Deterministic fake 'decode + feature extract'.

    REAL IMPLEMENTATION REQUIRES: PIL / torchaudio / ffmpeg — not installed
    here. Raise-or-fake is controlled by the caller; this fake hashes the
    bytes into FEATURE_DIM floats in [0, 1) so downstream plumbing (ANN over
    media features, dedup by feature) is fully exercisable and reproducible.
    """
    if content is None:
        return None
    h = hashlib.md5(content).digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


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
                    "feature": pdf["content"].map(_decode_stub),
                }
            )

    return media.select("media_id", "kind", "content").mapInPandas(fn, out_schema)


def _resize_stub(content: bytes | None, width: int, height: int) -> bytes | None:
    """Deterministic fake 'resize'.

    REAL IMPLEMENTATION REQUIRES PIL (not installed here). The fake re-keys
    the bytes with the target dimensions (md5 chain to the byte budget of a
    w×h thumbnail) so downstream size/bytes accounting and idempotence are
    exercisable; the Spark-side plumbing (batching, metadata update) is real.
    """
    if content is None:
        return None
    budget = max(16, min(width * height // 64, 4096))
    out = bytearray()
    block = hashlib.md5(content + f"{width}x{height}".encode()).digest()
    while len(out) < budget:
        out.extend(block)
        block = hashlib.md5(block).digest()
    return bytes(out[:budget])


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """image rows → resized content + updated meta via mapInPandas
    (same iterator-of-Arrow-batches plumbing as decode_features)."""
    out_schema = media.schema

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            is_img = pdf["kind"] == "image"
            pdf = pdf.copy()
            pdf.loc[is_img, "content"] = pdf.loc[is_img, "content"].map(
                lambda b: _resize_stub(b, width, height)
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
