"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The decode step is STUBBED (image/audio libraries are not in this
container): ``decoder="fake"`` produces a deterministic payload-derived
feature so the Spark-side plumbing — schema, partitioning, UDF
signature, batch shape — is real and testable; ``decoder="real"``
raises NotImplementedError at the exact point a library call belongs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image|audio|video
    T.StructField("payload", T.BinaryType(), True),      # opaque encoded bytes
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]), True),
])

FEATURE_SCHEMA = (
    "media_id long, kind string, feat array<float>, feat_dim int, n_bytes long"
)


def synthetic_media_df(spark, n: int = 64, parallelism: int = 4) -> DataFrame:
    """Deterministic fake media table exercising the binary plumbing."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                payload = hashlib.sha256(f"media-{i}".encode()).digest() * (8 + i % 5)
                kind = kinds[i % 3]
                rows.append({
                    "media_id": i, "kind": kind, "payload": payload,
                    "meta": {"mime": f"{kind}/x-fake", "width": 64 + i % 32,
                             "height": 48, "duration_ms": 1000 * (i % 7)},
                })
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, parallelism).mapInPandas(gen, MEDIA_SCHEMA)


def extract_features(media: DataFrame, feat_dim: int = 16,
                     decoder: str = "fake") -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    Real deployment: replace ``_fake_decode`` with PIL/librosa/ffmpeg
    calls — signature, batching and schema stay identical.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
        # deterministic stand-in: bytes -> fixed-dim float features
        arr = np.frombuffer(hashlib.sha256(payload).digest(), dtype=np.uint8)
        reps = int(np.ceil(dim / len(arr)))
        return (np.tile(arr, reps)[:dim] / 255.0).astype(np.float32)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media decoding needs PIL/librosa/ffmpeg — not in "
                    "this container; plumbing verified with decoder='fake'"
                )
            feats = [
                _fake_decode(bytes(p), feat_dim) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feat": feats,
                "feat_dim": feat_dim,
                "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
            })

    # NO repartition: extraction is row-local and per-row deterministic
    # (features are a pure function of the payload), so the UDF runs
    # directly on scan partitions — shuffling the binary payloads (the
    # heaviest column) would dominate at scale for zero benefit. Batch
    # size is governed by spark.sql.execution.arrow.maxRecordsPerBatch.
    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame to decode
    (expression-level; the decode itself is the stubbed UDF)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                           F.lit(every_ms))
            ).alias("frame_ms"),
        )
    )
