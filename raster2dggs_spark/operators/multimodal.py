"""Multimodal (binary payload) operators — the image/audio/video column
surface of a training-data pipeline.

Payloads stay opaque ``binary`` columns with typed metadata until a
Pandas-UDF boundary decodes them.  Our own codecs (raw/zlib/q8) decode
for real; external codecs (JPEG/PNG via PIL, audio/video) are gated
behind an import-try and raise NotImplementedError offline — the
Spark-side plumbing (schema, batching, partitioning) is identical and is
what these operators exercise.
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


def frame_sample(videos: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling stub: real Spark plumbing (schema below,
    mapInPandas batching), decode gated on an unavailable codec.
    Output schema: (video_id, frame_idx, frame_bytes)."""
    schema = T.StructType([
        T.StructField("video_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), False),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for _pdf in batches:
            raise NotImplementedError(
                "video decode requires an external codec (unavailable "
                "offline); schema/batching/partitioning are exercised by "
                "tests via the declared plan"
            )
        yield  # pragma: no cover

    return videos.mapInPandas(fn, schema)
