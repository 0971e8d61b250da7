"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode libraries (PIL/ffmpeg/librosa) are NOT in this container,
so the decode kernels are stubbed (deterministic fake or
NotImplementedError per the build brief) — but the Spark-side
contract is real and tested: schemas, Arrow batch shapes,
``mapInPandas`` signatures, partition sizing.

Scale notes: binary payloads dominate row size — keep them OUT of
shuffles (derive features first, drop the blob), size partitions by
``spark.sql.files.maxPartitionBytes`` so one task holds a bounded
number of blobs, and never collect() a binary column.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

IMAGE_FEATURE_SCHEMA = (
    "media_id long, n_bytes long, payload_sha string, mean_byte double, feature array<float>"
)


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake blobs for exercising the plumbing."""
    import hashlib

    rows = []
    for i in range(n):
        h = hashlib.md5(f"{seed}:{i}".encode()).digest()
        payload = (h * 64)[: 512 + (i % 7) * 128]
        rows.append(
            (i, ["image", "audio", "video"][i % 3], "application/octet-stream",
             bytearray(payload), 64 + i % 32, 64, 1000 + i * 10)
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def decode_image(payload: bytes) -> "np.ndarray":
    """Real decode requires PIL/libjpeg — not in this container."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; use fake_feature_extract for pipeline testing"
    )


def fake_feature_extract(
    media: DataFrame, dim: int = 8, batch_limit: int = 256
) -> DataFrame:
    """``mapInPandas`` feature extraction with a deterministic fake
    'decoder': byte-histogram moments as the feature vector. The real
    implementation swaps the kernel body, nothing else."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                feats, shas, means, sizes = [], [], [], []
                for payload in chunk["payload"]:
                    b = np.frombuffer(bytes(payload), dtype=np.uint8)
                    sizes.append(len(b))
                    shas.append(hashlib.sha256(bytes(payload)).hexdigest()[:16])
                    means.append(float(b.mean()) if len(b) else 0.0)
                    hist = np.histogram(b, bins=dim, range=(0, 256))[0].astype("float32")
                    total = hist.sum() or 1.0
                    feats.append((hist / total).tolist())
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].to_numpy(),
                        "n_bytes": sizes,
                        "payload_sha": shas,
                        "mean_byte": means,
                        "feature": feats,
                    }
                )

    return media.select("media_id", "payload").mapInPandas(
        kernel, schema=IMAGE_FEATURE_SCHEMA
    )


def frame_sample_plan(
    media: DataFrame, every_ms: int = 500
) -> DataFrame:
    """Video frame-sampling PLAN: one output row per (media_id,
    frame_ts) on a regular grid up to duration — pure column algebra
    (sequence + explode); the decode of each frame is the stubbed
    kernel above. This is the real partition-explosion shape a video
    pipeline has to survive."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
