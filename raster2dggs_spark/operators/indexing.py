"""Pixel→DGGS-cell indexing — the engine's Stage 1.

Reference semantics (point transfer): every pixel centre is affine-
transformed to WGS84 and encoded to its containing cell at ``res``, plus a
parent cell at ``parent_res`` used as the partition key
(/root/reference/raster2dggs/indexers/rasterindexer.py:118-221 and
h3rasterindexer.py:15-40).  Architecture here is Spark-first:

- one ``mapInPandas`` over image rows replaces the reference's thread pool
  + temp hive store (Arrow both directions, no per-row Python),
- the shuffle at ``groupBy(parent, cell)`` replaces the stage-1/stage-2
  disk round-trip,
- for algebraic aggregates we pre-aggregate per (image, cell) *inside* the
  UDF (map-side combine): the shuffle then moves ~cells instead of
  ~pixels — the decisive 100-TB lever (SURVEY.md §4).

Nodata semantics are the reference's exactly: ``omit`` masks per-band
nodata to NaN and drops only pixels that are nodata in *every* band
(rasterindexer.py:160-170); ``emit`` keeps all pixels and fills
(rasterindexer.py:146-157).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_BANDS_DEFAULT = 4


def band_cols(n_bands: int) -> list[str]:
    return [f"band_{i + 1}" for i in range(n_bands)]


def cell_column_name(dggs: str, res: int) -> str:
    """Reference's zero-padded output column naming, e.g. ``h3_09``
    (/root/reference/raster2dggs/indexers/rasterindexer.py:76-82)."""
    pad = 2
    return f"{dggs}_{res:0{pad}d}"


def _decode_rows(pdf: pd.DataFrame, bands_sel):
    """Yield (row, (bands,h,w) float32 array masked per nodata→NaN)."""
    from raster2dggs_spark.codecs import decode_image

    for row in pdf.itertuples(index=False):
        arr = decode_image(row.bytes)
        if bands_sel is not None:
            take = [b - 1 for b in bands_sel if b - 1 < arr.shape[0]]
            arr = arr[take]
        nd = row.nodata
        if nd is not None and not (isinstance(nd, float) and np.isnan(nd)):
            arr = np.where(arr == np.float32(nd), np.nan, arr)
        yield row, arr


def _encode_points(lon, lat, res, parent_res, dggs):
    from raster2dggs_spark.dggs import h3lib, s2lib

    if dggs == "h3":
        cell = h3lib.latlng_to_cell(lon, lat, res)
        parent = h3lib.cell_to_parent(cell, parent_res)
    elif dggs == "s2":
        cell = s2lib.lonlat_to_cell(lon, lat, res)
        parent = s2lib.cell_to_parent(cell, parent_res)
    else:
        raise ValueError(f"unknown dggs {dggs!r}")
    return cell, parent


def default_parent_res(res: int, dggs: str = "h3") -> int:
    """Reference default: parent_res = max(0, res - offset), offset sized
    for ~64K subcells per partition (cli_factory.py:124-161): H3 offset 6
    (7^6≈117K), S2 offset 8 (4^8=65K)."""
    return max(0, res - (6 if dggs == "h3" else 8))


def pixel_cells(
    images: DataFrame,
    res: int,
    parent_res: int | None = None,
    dggs: str = "h3",
    bands: list[int] | None = None,
    n_bands: int = MAX_BANDS_DEFAULT,
    nodata_policy: str = "omit",
    nodata_fill: float | None = None,
    keep_image_id: bool = True,
) -> DataFrame:
    """Explode images into per-pixel cell rows (narrow, no shuffle).

    Output: (image_id?, parent, cell, band_1..band_k doubles).  Fixed
    schema: images with fewer bands emit nulls in the tail columns — the
    Spark-safe version of the reference's all-nodata band drop
    (SURVEY.md §2.2 P5)."""
    if parent_res is None:
        parent_res = default_parent_res(res, dggs)
    bcols = band_cols(n_bands)
    fields = ([T.StructField("image_id", T.StringType(), False)] if keep_image_id else [])
    fields += [
        T.StructField("parent", T.LongType(), False),
        T.StructField("cell", T.LongType(), False),
    ] + [T.StructField(c, T.DoubleType(), True) for c in bcols]
    schema = T.StructType(fields)

    emit_fill = nodata_fill

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from raster2dggs_spark.geo import pixel_centers_lonlat

        buf: list[pd.DataFrame] = []
        buf_rows = 0
        for pdf in batches:
            for row, arr in _decode_rows(pdf, bands):
                k, h, w = arr.shape
                vals = arr.reshape(k, h * w).astype(np.float64)
                if nodata_policy == "omit":
                    keep = ~np.all(np.isnan(vals), axis=0)
                    if not keep.any():
                        continue
                elif nodata_policy == "emit":
                    keep = slice(None)
                    if emit_fill is not None:
                        vals = np.where(np.isnan(vals), emit_fill, vals)
                    elif row.nodata is not None and not np.isnan(row.nodata):
                        vals = np.where(np.isnan(vals), row.nodata, vals)
                else:
                    raise ValueError(nodata_policy)
                affine = (row.affine_a, row.affine_b, row.affine_c,
                          row.affine_d, row.affine_e, row.affine_f)
                lon, lat = pixel_centers_lonlat(affine, w, h, row.crs)
                lon, lat = lon[keep], lat[keep]
                vals = vals[:, keep]
                cell, parent = _encode_points(lon, lat, res, parent_res, dggs)
                data = {}
                if keep_image_id:
                    data["image_id"] = np.repeat(row.image_id, cell.shape[0])
                data["parent"] = parent
                data["cell"] = cell
                for i, c in enumerate(bcols):
                    data[c] = vals[i] if i < k else np.full(cell.shape[0], np.nan)
                buf.append(pd.DataFrame(data))
                buf_rows += cell.shape[0]
                if buf_rows >= 1_000_000:
                    yield pd.concat(buf, ignore_index=True)
                    buf, buf_rows = [], 0
        if buf:
            yield pd.concat(buf, ignore_index=True)

    return images.mapInPandas(fn, schema)


# ---- flagship: decode→index→aggregate with map-side combine ------------

_PARTIAL_AGGS = ("count", "sum", "min", "max", "sumsq")


def _partial_schema(n_bands: int) -> T.StructType:
    fields = [
        T.StructField("parent", T.LongType(), False),
        T.StructField("cell", T.LongType(), False),
    ]
    for c in band_cols(n_bands):
        fields += [
            T.StructField(f"{c}_cnt", T.LongType(), True),
            T.StructField(f"{c}_sum", T.DoubleType(), True),
            T.StructField(f"{c}_min", T.DoubleType(), True),
            T.StructField(f"{c}_max", T.DoubleType(), True),
            T.StructField(f"{c}_sumsq", T.DoubleType(), True),
        ]
    return T.StructType(fields)


def cell_partials(
    images: DataFrame,
    res: int,
    parent_res: int | None = None,
    dggs: str = "h3",
    bands: list[int] | None = None,
    n_bands: int = MAX_BANDS_DEFAULT,
    nodata_policy: str = "omit",
) -> DataFrame:
    """Per-(image, cell) algebraic partials computed inside the UDF.

    The per-cell NumPy reduction reuses the reference's unique-dedupe trick
    (np.unique + inverse indices, h3rasterindexer.py:28-36) — each distinct
    cell is reduced once per tile, so shuffle volume is ~#cells, not
    ~#pixels."""
    if parent_res is None:
        parent_res = default_parent_res(res, dggs)
    bcols = band_cols(n_bands)
    schema = _partial_schema(n_bands)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from raster2dggs_spark.geo import pixel_centers_lonlat

        buf: list[pd.DataFrame] = []
        buf_rows = 0
        for pdf in batches:
            for row, arr in _decode_rows(pdf, bands):
                k, h, w = arr.shape
                vals = arr.reshape(k, h * w).astype(np.float64)
                if nodata_policy == "omit":
                    keep = ~np.all(np.isnan(vals), axis=0)
                    if not keep.any():
                        continue
                    vals = vals[:, keep]
                else:
                    keep = slice(None)
                affine = (row.affine_a, row.affine_b, row.affine_c,
                          row.affine_d, row.affine_e, row.affine_f)
                lon, lat = pixel_centers_lonlat(affine, w, h, row.crs)
                lon, lat = lon[keep], lat[keep]
                cell, parent = _encode_points(lon, lat, res, parent_res, dggs)
                ucell, inv = np.unique(cell, return_inverse=True)
                m = ucell.shape[0]
                # parent of first occurrence per unique cell
                first = np.zeros(m, dtype=np.int64)
                first[inv[::-1]] = np.arange(cell.shape[0] - 1, -1, -1)
                data = {"parent": parent[first], "cell": ucell}
                for i, c in enumerate(bcols):
                    if i < k:
                        v = vals[i]
                        ok = ~np.isnan(v)
                        cnt = np.bincount(inv[ok], minlength=m).astype(np.int64)
                        s = np.bincount(inv[ok], weights=v[ok], minlength=m)
                        ssq = np.bincount(inv[ok], weights=v[ok] ** 2, minlength=m)
                        mn = np.full(m, np.nan)
                        mx = np.full(m, np.nan)
                        if ok.any():
                            np.minimum.at(
                                mn := np.full(m, np.inf), inv[ok], v[ok]
                            )
                            np.maximum.at(
                                mx := np.full(m, -np.inf), inv[ok], v[ok]
                            )
                            mn[cnt == 0] = np.nan
                            mx[cnt == 0] = np.nan
                        data[f"{c}_cnt"] = cnt
                        data[f"{c}_sum"] = np.where(cnt > 0, s, np.nan)
                        data[f"{c}_min"] = mn
                        data[f"{c}_max"] = mx
                        data[f"{c}_sumsq"] = np.where(cnt > 0, ssq, np.nan)
                    else:
                        data[f"{c}_cnt"] = np.zeros(m, dtype=np.int64)
                        for suf in ("sum", "min", "max", "sumsq"):
                            data[f"{c}_{suf}"] = np.full(m, np.nan)
                buf.append(pd.DataFrame(data))
                buf_rows += m
                if buf_rows >= 1_000_000:
                    yield pd.concat(buf, ignore_index=True)
                    buf, buf_rows = [], 0
        if buf:
            yield pd.concat(buf, ignore_index=True)

    return images.mapInPandas(fn, schema)


def index_point_agg(
    images: DataFrame,
    res: int,
    agg: str = "mean",
    parent_res: int | None = None,
    dggs: str = "h3",
    bands: list[int] | None = None,
    n_bands: int = MAX_BANDS_DEFAULT,
    nodata_policy: str = "omit",
) -> DataFrame:
    """Flagship query: reference's ``--point value --agg <f>`` path
    (SURVEY.md §3.1), one shuffle total.

    agg ∈ {mean, sum, count, min, max, std, var}: computed from algebraic
    partials so the combine is exact and single-pass."""
    if parent_res is None:
        parent_res = default_parent_res(res, dggs)
    partials = cell_partials(
        images, res, parent_res, dggs, bands, n_bands, nodata_policy
    )
    bcols = band_cols(n_bands)
    aggs = []
    for c in bcols:
        aggs += [
            F.sum(f"{c}_cnt").alias(f"{c}_cnt"),
            F.sum(f"{c}_sum").alias(f"{c}_sum"),
            F.min(f"{c}_min").alias(f"{c}_min"),
            F.max(f"{c}_max").alias(f"{c}_max"),
            F.sum(f"{c}_sumsq").alias(f"{c}_sumsq"),
        ]
    g = partials.groupBy("parent", "cell").agg(*aggs)
    out_cols = [F.col("parent"), F.col("cell")]
    for c in bcols:
        cnt = F.col(f"{c}_cnt")
        s = F.col(f"{c}_sum")
        if agg == "mean":
            e = F.when(cnt > 0, s / cnt)
        elif agg == "sum":
            e = F.when(cnt > 0, s)
        elif agg == "count":
            e = cnt.cast("double")
        elif agg == "min":
            e = F.col(f"{c}_min")
        elif agg == "max":
            e = F.col(f"{c}_max")
        elif agg in ("var", "std"):
            # sample variance from (n, Σx, Σx²)
            v = (F.col(f"{c}_sumsq") - s * s / cnt) / (cnt - 1)
            e = F.when(cnt > 1, F.sqrt(v) if agg == "std" else v)
        else:
            raise ValueError(f"agg {agg!r} needs the raw-pixel path")
        out_cols.append(e.alias(c))
    return g.select(*out_cols)


def to_reference_output(df: DataFrame, dggs: str, res: int, parent_res: int) -> DataFrame:
    """Output-edge formatting: hex-string cell ids in zero-padded columns,
    hive-partition-ready (reference output contract, common.py:533-572)."""
    cell_col = cell_column_name(dggs, res)
    parent_col = cell_column_name(dggs, parent_res)
    return df.withColumn(cell_col, F.lower(F.hex("cell"))).withColumn(
        parent_col, F.lower(F.hex("parent"))
    ).drop("cell", "parent")
