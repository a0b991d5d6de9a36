"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs.

Decode paths:

- ``decoder="fake"``: deterministic payload-derived features — the
  plumbing (schema, partitioning, UDF signature, batch shape) without
  any container parsing.
- ``decoder="real"``: ACTUAL decoding for the containers parseable
  with numpy alone — RIFF/WAV 16-bit PCM and uncompressed 24-bit BMP
  (mimir_spark.media_codecs) — with audio features (duration, RMS,
  zero-crossings, FFT band energies) and image features (channel
  stats + luminance histogram over a nearest-neighbor thumbnail).
  Codec formats (JPEG/MP3/H.264) raise NotImplementedError at the
  exact point an external-library call belongs — those libs are not
  in this container.
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


def synthetic_media_real_df(spark, n: int = 48,
                            parallelism: int = 4) -> DataFrame:
    """Deterministic media table whose payloads are GENUINE container
    files: WAV (sine + harmonics, parameters derived from media_id)
    and BMP (deterministic gradient pattern). Exercises the real
    decode path end to end; 'video' rows carry a BMP representative
    frame (frame_sample_plan remains the per-frame scheduling op)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([real_media_row(int(i)) for i in pdf["id"]])

    return spark.range(0, n, 1, parallelism).mapInPandas(gen, MEDIA_SCHEMA)


def real_media_row(i: int) -> dict:
    """One deterministic real-container row (pure function of i — the
    same property that makes the driver oracle a literal replay)."""
    from . import media_codecs

    kind = ["image", "audio", "video"][i % 3]
    if kind == "audio":
        rate = 8000
        t = np.arange(rate // 2 + 64 * (i % 7)) / rate
        freq = 110.0 * (1 + i % 12)
        wave = (0.6 * np.sin(2 * np.pi * freq * t)
                + 0.3 * np.sin(2 * np.pi * 2 * freq * t))
        pcm = np.round(wave * 20000).astype(np.int16)
        payload = media_codecs.encode_wav(pcm, rate)
        meta = {"mime": "audio/wav", "width": None, "height": None,
                "duration_ms": int(1000 * len(t) / rate)}
    else:
        w, h = 40 + i % 24, 30 + i % 16
        yy, xx = np.mgrid[0:h, 0:w]
        px = np.stack([
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            ((xx + yy + i) % 256),
        ], axis=-1).astype(np.uint8)
        payload = media_codecs.encode_bmp(px)
        meta = {"mime": "image/bmp", "width": w, "height": h,
                "duration_ms": 1000 * (i % 7) if kind == "video" else None}
    return {"media_id": i, "kind": kind, "payload": payload, "meta": meta}


def extract_features(media: DataFrame, feat_dim: int = 16,
                     decoder: str = "fake") -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    ``decoder="real"`` parses WAV/BMP containers with numpy
    (media_codecs) and raises for codec formats at the exact point an
    external-library call belongs — signature, batching and schema
    stay identical when a real deployment swaps in PIL/librosa/ffmpeg.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
        # deterministic stand-in: bytes -> fixed-dim float features
        arr = np.frombuffer(hashlib.sha256(payload).digest(), dtype=np.uint8)
        reps = int(np.ceil(dim / len(arr)))
        return (np.tile(arr, reps)[:dim] / 255.0).astype(np.float32)

    def _real_decode(payload: bytes, dim: int) -> np.ndarray:
        from . import media_codecs

        feat = media_codecs.decode_features(payload, dim)
        if feat is None:
            raise NotImplementedError(
                "codec media formats (JPEG/MP3/H.264) need PIL/librosa/"
                "ffmpeg — not in this container; numpy-native containers "
                "(RIFF/WAV PCM, uncompressed BMP) decode for real"
            )
        return feat

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _fake_decode if decoder == "fake" else _real_decode
        for pdf in batches:
            feats = [
                decode(bytes(p), feat_dim) if p is not None else None
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


RESIZED_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int"
)


def resize_images(media: DataFrame, out_h: int, out_w: int,
                  strict: bool = False) -> DataFrame:
    """Decode -> nearest-neighbor resize -> re-encode, row-local via
    mapInPandas (no Exchange — same scan-partition discipline as
    extract_features). BMP payloads are resized for real
    (media_codecs); non-image or codec-format payloads pass through
    with NULL output unless ``strict`` (where a library decode
    belongs)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import media_codecs

        for pdf in batches:
            out = []
            for mid, kind, p in zip(pdf["media_id"], pdf["kind"],
                                    pdf["payload"]):
                if p is not None and media_codecs.sniff_kind(bytes(p)) == "bmp":
                    px = media_codecs.decode_bmp(bytes(p))
                    small = media_codecs.resize_nearest(px, out_h, out_w)
                    out.append((mid, kind,
                                media_codecs.encode_bmp(small), out_w, out_h))
                elif strict:
                    raise NotImplementedError(
                        "non-BMP resize needs PIL/ffmpeg — not in this "
                        "container")
                else:
                    out.append((mid, kind, None, None, None))
            yield pd.DataFrame(out, columns=[
                "media_id", "kind", "payload", "width", "height"])

    return media.mapInPandas(run, RESIZED_SCHEMA)


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
