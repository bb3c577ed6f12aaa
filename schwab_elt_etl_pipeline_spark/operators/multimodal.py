"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as ``binary`` columns with a
metadata struct, and runs decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` stages — the only places Python belongs in the
hot path, because codec work can't be expressed as Spark expressions.

The decode kernels themselves are STUBBED here (no image/audio libs in this
container): ``decode_stub_features`` computes deterministic fake features from
the raw bytes so the Spark-side plumbing — schema, batch iteration, partition
sizing, UDF signature — is real and testable; swap ``_decode_one`` for a real
codec (PIL/ffmpeg) in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: media row: opaque payload + typed metadata (schema contract for sources)
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # 'image' | 'audio' | 'video'
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def _decode_one(payload: bytes) -> list[float]:
    """STUB decode: deterministic pseudo-features from the payload bytes.

    Production swaps this for a real codec (PIL.Image.open / soundfile /
    pyav frame sampling). Raising ``NotImplementedError`` here would be
    equally honest; a deterministic fake keeps the pipeline testable.
    """
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def decode_stub_features(media: DataFrame, batch_hint_rows: int = 1024) -> DataFrame:
    """Arrow-batched decode/feature-extract over ``mapInPandas``.

    Batch shape: the iterator yields pandas frames of Arrow-batch size;
    payloads never round-trip through the driver. Partition count governs
    parallelism — repartition upstream if media blobs are few-but-huge.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                    "features": pdf["payload"].map(_decode_one),
                }
            )

    return media.mapInPandas(decode_batches, schema=_FEATURES_SCHEMA)


_RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Binary→binary transform plumbing (image resize shape): ``mapInPandas``
    stage that rewrites the payload and the typed metadata in one pass.

    STUB kernel: the "resized" payload is the original bytes truncated in
    proportion to the pixel-count change (deterministic; production swaps in
    PIL). What this pins down for real: output schema keeps the binary
    column + meta struct contract, payloads stay executor-side, and the
    stage preserves row count and partitioning."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def shrink(row):
                payload = row["payload"] or b""
                meta = row["meta"] or {}  # meta is nullable in MEDIA_SCHEMA
                old_px = max((meta.get("width") or 1) * (meta.get("height") or 1), 1)
                keep = max(1, int(len(payload) * min(1.0, width * height / old_px)))
                return payload[:keep]

            def remeta(m):
                m = m or {}
                return {
                    "width": width,
                    "height": height,
                    "duration_ms": m.get("duration_ms"),
                    "sample_rate": m.get("sample_rate"),
                }

            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": pdf.apply(shrink, axis=1),
                    "meta": pdf["meta"].map(remeta),
                }
            )
            yield out

    return media.mapInPandas(resize_batches, schema=_RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: the sample timestamps are a
    native ``sequence`` explode (pure Spark); only the per-frame decode would
    be a ``mapInPandas`` stage (stubbed out, same shape as
    :func:`decode_stub_features`)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                    F.lit(every_ms).cast("long"),
                )
            ).alias("frame_at_ms"),
        )
    )
