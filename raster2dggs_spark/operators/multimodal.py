"""Multimodal (binary payload) operators — the image/audio/video column
surface of a training-data pipeline.

Payloads stay opaque ``binary`` columns with typed metadata until a
Pandas-UDF boundary decodes them.  Our own codecs decode for real:
raw/zlib/q8 images (codecs/image.py) and the rvid/rpcm video/audio
containers (codecs/media.py, deterministic stand-ins whose decode call
is the only line a real mp4/wav codec would replace).  External codecs
(JPEG/PNG via PIL, mp4, wav) are gated behind an import-try / fmt check
and raise NotImplementedError offline — the Spark-side plumbing
(schema, batching, partitioning) is identical either way.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not installed offline
    from PIL import Image as _PIL_Image
except ImportError:
    _PIL_Image = None


def decode_any(buf: bytes, fmt: str) -> np.ndarray:
    """Decode a payload to (bands, h, w) float32.  Our formats decode
    natively; JPEG/PNG require PIL (NotImplementedError offline)."""
    from raster2dggs_spark.codecs import decode_image

    if fmt in ("raw", "zlib", "q8"):
        return decode_image(buf)
    if fmt in ("jpeg", "png"):
        if _PIL_Image is None:
            raise NotImplementedError(
                f"{fmt} decode needs PIL, unavailable offline; plumbing is "
                "identical to the native formats"
            )
        import io

        img = np.asarray(_PIL_Image.open(io.BytesIO(buf)), dtype=np.float32)
        return np.moveaxis(np.atleast_3d(img), -1, 0)
    raise ValueError(f"unknown fmt {fmt!r}")


def image_stats(images: DataFrame) -> DataFrame:
    """Decode + per-image feature extraction: dims, per-band-1 mean/std,
    fraction of nodata pixels, recomputed phash — the feature-extract
    stage of a multimodal pipeline, Arrow-batched."""
    schema = T.StructType([
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bands_decoded", T.IntegerType(), False),
        T.StructField("px", T.LongType(), False),
        T.StructField("b1_mean", T.DoubleType(), True),
        T.StructField("b1_std", T.DoubleType(), True),
        T.StructField("nan_frac", T.DoubleType(), False),
        T.StructField("phash_recomputed", T.LongType(), False),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from raster2dggs_spark.codecs import average_hash64

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = decode_any(r.bytes, r.fmt)
                b1 = arr[0]
                finite = np.isfinite(b1)
                rows.append((
                    r.image_id, arr.shape[0], int(arr[0].size),
                    float(b1[finite].mean()) if finite.any() else None,
                    float(b1[finite].std()) if finite.any() else None,
                    float(1.0 - finite.mean()),
                    average_hash64(b1),
                ))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return images.select("image_id", "bytes", "fmt").mapInPandas(fn, schema)


def thumbnails(images: DataFrame, size: int = 8) -> DataFrame:
    """Real nearest-neighbor resize (NumPy — no external codec needed):
    band 1 downsampled to (size, size), returned as a flat double array.
    The resize/feature-extract stage shape for image corpora."""
    schema = T.StructType([
        T.StructField("image_id", T.StringType(), False),
        T.StructField("thumb", T.ArrayType(T.DoubleType()), False),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, thumbs = [], []
            for r in pdf.itertuples(index=False):
                arr = decode_any(r.bytes, r.fmt)[0]
                h, w = arr.shape
                ri = (np.arange(size) * h // size).clip(0, h - 1)
                ci = (np.arange(size) * w // size).clip(0, w - 1)
                small = np.nan_to_num(arr[np.ix_(ri, ci)], nan=0.0)
                ids.append(r.image_id)
                thumbs.append(small.astype(np.float64).ravel().tolist())
            yield pd.DataFrame({"image_id": ids, "thumb": thumbs})

    return images.select("image_id", "bytes", "fmt").mapInPandas(fn, schema)


def frame_sample(videos: DataFrame, n_samples: int = 4) -> DataFrame:
    """Uniform temporal frame sampling: frame j of n takes index
    floor(j·T/n) (dedup'd when T < n).  Decodes the ``rvid`` container
    for real (codecs/media.py — a deterministic stand-in whose decode
    call is the ONLY thing a real mp4 codec would replace; external
    formats raise NotImplementedError offline).  Sampled frames are
    re-encoded with the image ``raw`` codec, so the output rows are
    image-table-shaped and feed straight into image_stats/thumbnails —
    the video→image handoff of a multimodal pipeline.

    Output: (video_id, frame_idx, frame_bytes, h, w, f_mean, f_min,
    f_max)."""
    schema = T.StructType([
        T.StructField("video_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("f_mean", T.DoubleType(), False),
        T.StructField("f_min", T.DoubleType(), False),
        T.StructField("f_max", T.DoubleType(), False),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from raster2dggs_spark.codecs import (
            decode_video, encode_image, video_meta,
        )

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.fmt != "rvid":
                    raise NotImplementedError(
                        f"{r.fmt} decode needs an external codec, "
                        "unavailable offline; rvid exercises the "
                        "identical plumbing"
                    )
                t, h, w = video_meta(r.bytes)
                if t == 0:
                    continue  # zero-frame clip: nothing to sample
                idx = np.unique((np.arange(n_samples) * t) // n_samples)
                frames = decode_video(r.bytes, idx)
                for j, fi in enumerate(idx.tolist()):
                    fr = frames[j]
                    rows.append((
                        r.video_id, int(fi),
                        encode_image(fr[None, :, :], "raw"),
                        h, w,
                        float(fr.astype(np.float64).mean()),
                        float(fr.min()), float(fr.max()),
                    ))
            if rows:
                yield pd.DataFrame(
                    rows, columns=[f.name for f in schema.fields]
                )

    return videos.select("video_id", "bytes", "fmt").mapInPandas(fn, schema)


def audio_features(audio: DataFrame, window: int = 1024) -> DataFrame:
    """Windowed audio features over ``rpcm`` payloads: per full window —
    RMS (sqrt of mean int16²: integer sums, exactly representable in
    doubles, so bit-reproducible anywhere), zero-crossing count
    (sign products within the window) and peak |amplitude|.  The
    feature-extract stage shape for audio corpora; trailing partial
    windows are dropped (fixed batch shape)."""
    schema = T.StructType([
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("win_idx", T.IntegerType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("zero_crossings", T.LongType(), False),
        T.StructField("peak", T.LongType(), False),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from raster2dggs_spark.codecs import decode_audio

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.fmt != "rpcm":
                    raise NotImplementedError(
                        f"{r.fmt} decode needs an external codec, "
                        "unavailable offline; rpcm exercises the "
                        "identical plumbing"
                    )
                samples, _rate = decode_audio(r.bytes)
                nwin = samples.shape[0] // window
                if nwin == 0:
                    continue
                x = samples[: nwin * window].astype(np.int64)
                x = x.reshape(nwin, window)
                sq = (x * x).sum(axis=1)
                rms = np.sqrt(sq / float(window))
                zc = ((x[:, :-1] * x[:, 1:]) < 0).sum(axis=1)
                peak = np.abs(x).max(axis=1)
                for wi in range(nwin):
                    rows.append((r.audio_id, wi, float(rms[wi]),
                                 int(zc[wi]), int(peak[wi])))
            if rows:
                yield pd.DataFrame(
                    rows, columns=[f.name for f in schema.fields]
                )

    return audio.select("audio_id", "bytes", "fmt").mapInPandas(fn, schema)
