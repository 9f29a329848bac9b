"""Multimodal (image/audio/video) column plumbing (SURVEY §2.B L5).

Media are opaque ``binary`` columns + a typed metadata struct. The
Spark-side plumbing — schema, binaryFile scan, Arrow-batched
mapInPandas feature extraction, partitioning by media type — is real
and tested; the *codec* step is stubbed (this container has no
image/audio libraries) behind ``decode_stub``, which is deterministic
so tests can assert exact outputs. Swap ``decode_stub`` for a real
PIL/ffmpeg call in production; nothing else changes.

Scale notes: binary payloads never enter a shuffle here — extraction is
a map-only stage; outputs are small typed rows. Partition the input by
(media_type, date) so a 100 TB media lake prunes to the slice scanned.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("path", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("size_bytes", T.LongType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("size_bytes", T.LongType(), True),
        T.StructField("content_sha256", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def read_binary_dir(spark: SparkSession, path: str, media_type: str) -> DataFrame:
    """Scan a directory of media files as the canonical media table."""
    raw = spark.read.format("binaryFile").load(path)
    return raw.select(
        F.regexp_extract(F.col("path"), r"([^/]+)$", 1).alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.col("path"),
        F.col("content"),
        F.struct(
            F.col("length").alias("size_bytes"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def decode_stub(content: bytes) -> dict:
    """Deterministic fake decoder.

    A real implementation would call PIL/libav here (not available in
    this container). The stub derives stable pseudo-dimensions from the
    content hash so the downstream plumbing (batching, schema, joins)
    is exercised with realistic value shapes.
    """
    if content is None:
        return {"width": None, "height": None, "n_frames": None}
    digest = hashlib.sha256(content).digest()
    return {
        "width": 64 + digest[0] % 192,
        "height": 64 + digest[1] % 192,
        "n_frames": 1 + digest[2] % 32,
    }


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary columns.

    mapInPandas: each batch arrives as a pandas DataFrame with the raw
    bytes; per-file codec work happens vectorized-adjacent without a
    per-row Python UDF round trip.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [decode_stub(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "size_bytes": [
                        len(c) if c is not None else None for c in pdf["content"]
                    ],
                    "content_sha256": [
                        hashlib.sha256(c).hexdigest() if c is not None else None
                        for c in pdf["content"]
                    ],
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "n_frames": [d["n_frames"] for d in decoded],
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def resize_stub(content: bytes, width: int, height: int) -> bytes | None:
    """Deterministic fake resize: a real implementation calls
    PIL.Image.resize here. The stub emits width*height bytes derived by
    cycling the source sha256 so output size tracks the target
    dimensions and identical inputs produce identical outputs."""
    if content is None:
        return None
    seed = hashlib.sha256(content).digest()
    n = width * height
    return (seed * (n // len(seed) + 1))[:n]


def resize_media(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Batch resize over binary columns (the thumbnail/model-input-prep
    stage). Map-only mapInPandas: the binary payload is transformed in
    place per Arrow batch — at 100 TB the only data movement is the
    scan itself plus the (smaller) resized write."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "width": width,
                    "height": height,
                    "content": [resize_stub(c, width, height) for c in pdf["content"]],
                }
            )

    return media.mapInPandas(batches, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_sha256", T.StringType(), False),
    ]
)


def sample_frames(media: DataFrame, stride: int = 4) -> DataFrame:
    """Video frame sampling: one output row per kept frame (every
    ``stride``-th of the stub-decoded ``n_frames``) — the fan-out stage
    feeding a vision encoder. A real implementation seeks with
    libav/ffmpeg per kept index (never decoding the skipped frames);
    the stub derives each frame hash from (content sha, index).

    Shape note: this is a ROW-EXPANDING mapInPandas (videos -> frames).
    The expansion happens executor-side inside the Arrow batch, so the
    (huge) source bytes are read once and never shuffled; only the
    small frame rows move downstream.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, shas = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                base = hashlib.sha256(content).hexdigest()
                n = decode_stub(content)["n_frames"]
                for i in range(0, n, stride):
                    ids.append(mid)
                    idxs.append(i)
                    shas.append(
                        hashlib.sha256(f"{base}:{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_sha256": shas}
            )

    return media.mapInPandas(batches, FRAME_SCHEMA)
