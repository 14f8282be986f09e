"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas stages.

The decode step is STUBBED (no image/audio libraries in this container):
``decode_features`` derives a deterministic fake feature vector from the
payload bytes, clearly marked; swapping in a real decoder changes ONE
function — the Spark-side plumbing (schema, batching, partitioning, UDF
signatures) is real and tested.

Operators:
  * media_stats        — pure-SQL byte/metadata stats (oracle-checkable)
  * decode_features    — mapInPandas binary -> float features (stub kernel)
  * frame_sample       — every-k-th fixed-size chunk of a binary payload
                         (the video frame-sampling access pattern)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType, LongType,
                               StringType, StructField, StructType)

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("features", ArrayType(FloatType())),
])

FRAMES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame", BinaryType()),
])


def fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """STUB decoder: deterministic features from payload bytes (mean/spread
    of byte lanes). A real image/audio decoder replaces this function only.

    raise NotImplementedError here if accidental production use must fail
    loudly instead; the stub is kept callable so the pipeline is testable."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if len(arr) == 0:
        return np.zeros(dim, dtype=np.float32)
    pad = (-len(arr)) % dim
    lanes = np.pad(arr, (0, pad)).reshape(-1, dim).astype(np.float64)
    return (lanes.mean(axis=0) / 255.0).astype(np.float32)


def media_stats(media: DataFrame) -> DataFrame:
    """(media_id, kind, n_bytes, payload_md5) — pure SQL, oracle-checkable."""
    return media.select(
        "media_id", "kind",
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


def decode_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode: binary payload -> fixed-dim feature vector."""

    def _batches(it):
        for pdf in it:
            feats = [fake_decode(bytes(b)).tolist() for b in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "features": feats,
            })

    return media.select("media_id", "kind", "payload").mapInPandas(_batches, FEATURES_SCHEMA)


def frame_sample(media: DataFrame, frame_bytes: int = 64, every: int = 4) -> DataFrame:
    """Sample every ``every``-th fixed-size chunk ("frame") of each payload —
    the distributed access pattern of video frame sampling; chunking is done
    JVM-side cheaply, slicing inside Arrow batches."""

    def _batches(it):
        for pdf in it:
            rows = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(b)
                n = len(raw) // frame_bytes
                for fi in range(0, n, every):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(fi)
                    rows["frame"].append(raw[fi * frame_bytes:(fi + 1) * frame_bytes])
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(_batches, FRAMES_SCHEMA)
