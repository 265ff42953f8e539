"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched `mapInPandas`.

The Spark-side contract — schema, partition-preserving UDF shape,
batch iteration, metadata propagation — is real and tested; the actual
codec step is stubbed (this container ships no image/audio libraries)
behind `decode_stub`, which either raises NotImplementedError
(`strict=True`) or produces a deterministic fake feature vector so the
distributed plumbing can be exercised end-to-end.

At 100 TB the design notes that matter:
- binary payloads never enter a shuffle: feature extraction is a
  map-only stage (mapInPandas) running where the bytes were read;
- only the small feature/metadata output is shuffled or joined;
- `spark.sql.files.maxPartitionBytes` bounds task memory because each
  Arrow batch holds at most a few hundred blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
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

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sha_prefix", StringType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def synthetic_media(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from documents: the text
    bytes stand in for an encoded payload."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kinds.alias("kind"),
        F.concat(F.lit("application/x-fake-"), kinds).alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
        (F.col("doc_id") % 640 + 16).cast("long").alias("width"),
        (F.col("doc_id") % 480 + 16).cast("long").alias("height"),
        (F.col("doc_id") * 40 % 60_000).cast("long").alias("duration_ms"),
    )


def decode_stub(payload: bytes, kind: str, dim: int = 8, strict: bool = False) -> np.ndarray:
    """STUB for the real decoder (PIL/librosa/ffmpeg are not in this
    container). strict=True raises like a missing codec would; default
    returns a deterministic md5-derived feature vector so the Spark
    plumbing is testable."""
    if strict:
        raise NotImplementedError(
            f"real {kind} decoding requires codec libraries not present here"
        )
    digest = hashlib.md5(payload).digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / 0xFFFFFFFF).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Map-only feature extraction over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(bytes(p), k, dim)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "sha_prefix": [
                        hashlib.sha256(bytes(p)).hexdigest()[:16] for p in pdf["payload"]
                    ],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each video into the frame
    timestamps a decoder would extract — pure JVM sequence/explode; the
    decode itself is the stubbed step."""
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ms"),
    )
