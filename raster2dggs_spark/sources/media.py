"""Deterministic synthetic video/audio tables (multimodal fixtures).

Payload contents are pure INTEGER arithmetic in (entity, t/i, r, c) —
px(v,t,r,c) = (t·7919 + r·104729 + c·1299709 + v·31) mod 251,
pcm(v,i)   = (i·7919 + v·104729 + 12345) mod 65536 − 32768 —
so a SQL oracle can recompute every decoded value bit-exactly from
generate_series (no float ops until the feature stage)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import types as T

from raster2dggs_spark.codecs import (
    average_hash64, encode_audio, encode_video,
)

VIDEO_SCHEMA = T.StructType([
    T.StructField("video_id", T.StringType(), False),
    T.StructField("bytes", T.BinaryType(), False),
    T.StructField("fmt", T.StringType(), False),
    T.StructField("n_frames", T.IntegerType(), False),
    T.StructField("h", T.IntegerType(), False),
    T.StructField("w", T.IntegerType(), False),
    T.StructField("fps", T.DoubleType(), False),
    T.StructField("caption", T.StringType(), False),
    T.StructField("vhash", T.LongType(), False),
])

AUDIO_SCHEMA = T.StructType([
    T.StructField("audio_id", T.StringType(), False),
    T.StructField("bytes", T.BinaryType(), False),
    T.StructField("fmt", T.StringType(), False),
    T.StructField("n_samples", T.IntegerType(), False),
    T.StructField("rate", T.IntegerType(), False),
    T.StructField("caption", T.StringType(), False),
])


def video_pixels(v: int, t: np.ndarray, h: int, w: int) -> np.ndarray:
    """(len(t), h, w) float32 of the closed-form pixel field."""
    tt = np.asarray(t, dtype=np.int64)[:, None, None]
    rr = np.arange(h, dtype=np.int64)[None, :, None]
    cc = np.arange(w, dtype=np.int64)[None, None, :]
    return ((tt * 7919 + rr * 104729 + cc * 1299709 + v * 31) % 251
            ).astype(np.float32)


def generate_videos_pdf(n: int, seed: int = 42) -> pd.DataFrame:
    rows = []
    for i in range(n):
        rng = np.random.default_rng(np.random.SeedSequence([seed, 7, i]))
        t = int(rng.integers(8, 25))
        h = int(rng.integers(16, 49))
        w = int(rng.integers(16, 49))
        frames = video_pixels(i, np.arange(t), h, w)
        rows.append({
            "video_id": f"vid_{i:04d}",
            "bytes": encode_video(frames),
            "fmt": "rvid",
            "n_frames": t, "h": h, "w": w,
            "fps": float(rng.choice([12.0, 24.0, 30.0])),
            "caption": f"synthetic clip {i} of seed {seed}",
            "vhash": int(average_hash64(frames[0])),
        })
    return pd.DataFrame(rows)


def videos_spark_df(spark, n: int, seed: int = 42):
    return spark.createDataFrame(generate_videos_pdf(n, seed), VIDEO_SCHEMA)


def audio_samples(v: int, n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.int64)
    return ((i * 7919 + v * 104729 + 12345) % 65536 - 32768).astype(np.int16)


def generate_audio_pdf(n: int, seed: int = 42) -> pd.DataFrame:
    rows = []
    for i in range(n):
        rng = np.random.default_rng(np.random.SeedSequence([seed, 9, i]))
        ns = int(rng.integers(4000, 8001))
        rows.append({
            "audio_id": f"aud_{i:04d}",
            "bytes": encode_audio(audio_samples(i, ns), 16_000),
            "fmt": "rpcm",
            "n_samples": ns, "rate": 16_000,
            "caption": f"synthetic audio {i} of seed {seed}",
        })
    return pd.DataFrame(rows)


def audio_spark_df(spark, n: int, seed: int = 42):
    return spark.createDataFrame(generate_audio_pdf(n, seed), AUDIO_SCHEMA)
