"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the *decode* step is a
deterministic fake (clearly marked); everything Spark-side — schema,
Arrow batch shape, partitioning, UDF signatures — is real and tested.
Swap `_fake_decode_image` for a real PIL/ffmpeg call on a cluster with
the codec libs installed and nothing else changes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def synth_media(spark, n: int) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    df = spark.range(n).withColumnRenamed("id", "media_id")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("media_id") % 3 + 1).cast("int"),
    )
    payload = F.encode(
        F.concat(F.lit("BLOB:"), F.conv(F.col("media_id") * 2654435761 % 2147483647, 10, 16)),
        "UTF-8",
    )
    return df.select(
        "media_id",
        kind.alias("kind"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        ((F.col("media_id") * 37) % 1920 + 1).cast("int").alias("width"),
        ((F.col("media_id") * 53) % 1080 + 1).cast("int").alias("height"),
        ((F.col("media_id") * 97) % 60000).cast("int").alias("duration_ms"),
    )


def _fake_decode_image(payload: bytes, dim: int = 8) -> np.ndarray:
    """DETERMINISTIC FAKE decode — stands in for PIL/libjpeg which are
    not installed here. Real deployments replace this function only."""
    h = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    reps = int(np.ceil(dim / max(len(h), 1)))
    return np.tile(h, reps)[:dim] / 255.0


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas.

    Batches stream through the Python worker; nothing is collected to
    the driver, and the operation is a narrow map (no shuffle).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode_image(bytes(p), dim).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts) —
    pure SQL explode of a timestamp sequence; the decode of each frame
    would run in extract_features downstream."""
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
