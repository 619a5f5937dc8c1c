"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched `mapInPandas`
UDFs. The decode kernels themselves are STUBS (the container has no image/audio
libs — clearly marked below); the Spark-side contract — schema, batch shape,
partitioning — is real and tested with the deterministic fake decoder.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal record schema.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _decode_payload(payload: bytes, kind: str) -> list[float]:
    """STUB decode kernel. A real deployment plugs PIL/ffmpeg/torchaudio here.

    Deterministic fake: 8 moments of the raw bytes, so tests and benchmarks
    exercise the exact Arrow batch path a real decoder would use.
    """
    if payload is None:
        return [0.0] * 8
    b = payload[:4096]
    n = max(len(b), 1)
    s = sum(b)
    return [
        float(len(payload)),
        float(s % 997),
        float(s / n),
        float(min(b) if b else 0),
        float(max(b) if b else 0),
        float(b[0] if b else 0),
        float(b[-1] if b else 0),
        float(n),
    ]


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, feature arrays out.

    Partitioning contract: payloads are large, so upstream should repartition
    by size (`spark.sql.files.maxPartitionBytes`) — the UDF only ever holds one
    Arrow batch in memory.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_payload(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "feature": feats}
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plan: explode sampled frame indices per record
    (pure SQL; the per-frame decode would reuse extract_features)."""
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_index"),
    )


def synthetic_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table for tests/benchmarks."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        payload = bytes((i * 7 + j) % 256 for j in range(64 + (i % 5) * 32))
        rows.append((i, kinds[i % 3], payload, 64 + i % 128, 64, 1 + (i % 30)))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _resize_payload(payload: bytes, width: int, height: int) -> bytes:
    """STUB resize kernel (PIL's `Image.resize` in a real deployment).

    Deterministic fake: re-sample the byte stream to width*height bytes by
    integer striding — byte-exact across engines/partitionings, so the
    Arrow round-trip (binary in -> binary out) is testable without PIL.
    """
    if payload is None or not payload:
        return bytes(width * height)
    target = max(width * height, 1)
    n = len(payload)
    return bytes(payload[(i * n) // target] for i in range(target))


def resize_images(df: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """mapInPandas image resize: binary payloads in, resized binary payloads
    out, metadata updated to the new dimensions. Non-image rows pass through
    untouched (resize is an image-kind transform; the plan keeps one Arrow
    batch in flight like ``extract_features``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            is_img = pdf["kind"] == "image"
            pdf = pdf.copy()
            pdf.loc[is_img, "payload"] = [
                _resize_payload(p, width, height) for p in pdf.loc[is_img, "payload"]
            ]
            pdf.loc[is_img, "width"] = width
            pdf.loc[is_img, "height"] = height
            yield pdf

    return df.mapInPandas(run, schema=df.schema)
