"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched `mapInPandas`
UDFs.

Decode kernels: uncompressed netpbm images (binary PGM "P5" / PPM "P6") are
decoded FOR REAL — pure stdlib header parse + numpy frombuffer, no image
library needed — including real pixel-statistics features and real
nearest-neighbor resize with P6 re-encode. Compressed formats (JPEG/PNG/
audio/video) remain STUBS (clearly marked below; the container ships no
codec libs — a real deployment plugs PIL/ffmpeg/torchaudio into the same
Arrow batch path, which is what the tests pin).
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


def decode_netpbm(payload: bytes):
    """REAL image decode for binary netpbm payloads: PGM (``P5``, grayscale)
    and PPM (``P6``, RGB). Returns a numpy array of shape (height, width,
    channels) dtype uint8, or None when the payload is not binary netpbm.

    Header grammar (netpbm spec): magic, then whitespace-separated width,
    height, maxval, where ``#`` starts a comment running to end-of-line;
    a single whitespace byte after maxval, then width*height*channels raw
    bytes (maxval <= 255 assumed — 16-bit netpbm is out of scope)."""
    import numpy as np

    if payload is None or len(payload) < 2 or payload[:1] != b"P":
        return None
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        return None
    channels = 1 if magic == b"P5" else 3
    pos, fields = 2, []
    n = len(payload)
    while len(fields) < 3 and pos < n:
        c = payload[pos]
        if c in b" \t\r\n":
            pos += 1
        elif c == ord("#"):
            while pos < n and payload[pos] != ord("\n"):
                pos += 1
        else:
            start = pos
            while pos < n and payload[pos] not in b" \t\r\n":
                pos += 1
            fields.append(int(payload[start:pos]))
    if len(fields) < 3:
        return None
    width, height, maxval = fields
    if maxval > 255 or width <= 0 or height <= 0:
        return None
    pos += 1  # the single whitespace byte after maxval
    need = width * height * channels
    if n - pos < need:
        return None
    arr = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    return arr.reshape(height, width, channels)


def _decode_payload(payload: bytes, kind: str) -> list[float]:
    """Decode kernel. Binary netpbm images decode FOR REAL (see
    ``decode_netpbm``) into pixel-statistics features: [width, height,
    channels, per-channel-mean mean, per-channel-std mean, min, max,
    pixel count]. Everything else falls through to the STUB byte-moments
    path (a real deployment plugs PIL/ffmpeg/torchaudio there —
    deterministic fake so tests and benchmarks exercise the exact Arrow
    batch path a real decoder would use).
    """
    if payload is None:
        return [0.0] * 8
    img = decode_netpbm(payload) if kind == "image" else None
    if img is not None:
        import numpy as np

        h, w, c = img.shape
        f = img.astype(np.float64)
        return [
            float(w),
            float(h),
            float(c),
            float(f.mean()),
            float(f.std(axis=(0, 1)).mean()),
            float(img.min()),
            float(img.max()),
            float(w * h),
        ]
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
    """Deterministic fake media table for tests/benchmarks. Payloads never
    start with a netpbm magic, so every row exercises the stub kernels (the
    gated oracle replays the stub byte-moments; real-decode coverage comes
    from ``synthetic_netpbm_media``)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        payload = bytes((i * 7 + j) % 256 for j in range(64 + (i % 5) * 32))
        rows.append((i, kinds[i % 3], payload, 64 + i % 128, 64, 1 + (i % 30)))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def encode_netpbm(arr) -> bytes:
    """Encode an (h, w) or (h, w, {1,3}) uint8 array as binary PGM/PPM."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    if c not in (1, 3):
        raise ValueError(f"netpbm supports 1 or 3 channels, got {c}")
    magic = b"P5" if c == 1 else b"P6"
    return magic + b"\n" + f"{w} {h}\n255\n".encode("ascii") + a.tobytes()


def synthetic_netpbm_media(spark, n: int = 20) -> DataFrame:
    """Deterministic REAL-decodable media table: binary PPM/PGM images whose
    pixel values are a known function of (media_id, row, col)."""
    import numpy as np

    rows = []
    for i in range(n):
        w, h = 4 + i % 5, 3 + i % 4
        c = 1 if i % 2 else 3
        yy, xx = np.mgrid[0:h, 0:w]
        img = ((yy * 31 + xx * 7 + i) % 256).astype(np.uint8)
        img = np.repeat(img[:, :, None], c, axis=2)
        rows.append((i, "image", encode_netpbm(img), w, h, 1))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _resize_payload(payload: bytes, width: int, height: int) -> bytes:
    """Resize kernel. Binary netpbm payloads resize FOR REAL — numpy
    nearest-neighbor index sampling (``floor(i * src / dst)``, the classic
    NN grid) re-encoded as the same netpbm flavor. Other payloads fall
    through to the STUB byte-striding path (PIL's `Image.resize` in a real
    deployment; deterministic fake so the binary-in -> binary-out Arrow
    round-trip is testable without PIL)."""
    img = decode_netpbm(payload)
    if img is not None:
        import numpy as np

        h, w, c = img.shape
        rows = (np.arange(height) * h) // height
        cols = (np.arange(width) * w) // width
        out = img[rows][:, cols]
        magic = b"P5" if c == 1 else b"P6"
        header = magic + b"\n" + f"{width} {height}\n255\n".encode("ascii")
        return header + out.tobytes()
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
