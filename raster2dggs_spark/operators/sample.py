"""Sample transfer (``--sample``): per-cell interpolation at cell centres.

Reference semantics (/root/reference/raster2dggs/interpolation.py):
- enumerate cells whose centre falls in the tile bbox (cells_in_bbox),
- ownership: a cell belongs to the tile containing its *nearest pixel*
  (interpolation.py:216-231, 262-277 — prevents boundary double-counting),
- kernels: NN (floor(frac+0.5)); bilinear 2×2 (weights renormalized over
  valid corners, >=2 valid, OOB -> NaN, no edge repeat,
  interpolation.py:241-371); bicubic Keys a=-0.5 4×4 (>=4 of 16 valid,
  interpolation.py:38-53, 373-456); Lanczos-3 6×6 windowed sinc (>=4
  valid, interpolation.py:56-74, 458-545).

Spark architecture: each tile owns its full decoded payload, so the
reference's margin-expanded locked re-read (interpolation.py:154-171)
disappears — the stencil is a pure slice.  Cross-tile duplicates (tiles
may overlap) are removed by a deterministic dedupe (SURVEY.md J4).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from raster2dggs_spark.operators.indexing import (
    MAX_BANDS_DEFAULT,
    band_cols,
    default_parent_res,
    _decode_rows,
    _prune,
)

KERNELS = ("nearest", "bilinear", "bicubic", "lanczos")


# ----------------------------------------------------------------------
# kernel weight functions (vectorized over offsets)
# ----------------------------------------------------------------------

def _keys_cubic(t, a=-0.5):
    at = np.abs(t)
    w = np.where(
        at <= 1.0,
        (a + 2.0) * at**3 - (a + 3.0) * at**2 + 1.0,
        np.where(at < 2.0, a * at**3 - 5.0 * a * at**2 + 8.0 * a * at - 4.0 * a, 0.0),
    )
    return w


def _lanczos(t, lobes=3):
    at = np.abs(t)
    with np.errstate(divide="ignore", invalid="ignore"):
        w = np.sinc(t) * np.sinc(t / lobes)
    return np.where(at < lobes, w, 0.0)


def _stencil_sample(band: np.ndarray, col_f: np.ndarray, row_f: np.ndarray,
                    kernel: str) -> np.ndarray:
    """Vectorized kernel evaluation at fractional pixel coords.

    Returns NaN where fewer than the kernel's minimum valid taps exist
    (the reference's valid-renormalization contract)."""
    h, w = band.shape
    n = col_f.shape[0]
    if kernel == "nearest":
        ci = np.floor(col_f + 0.5).astype(np.int64)
        ri = np.floor(row_f + 0.5).astype(np.int64)
        ok = (ci >= 0) & (ci < w) & (ri >= 0) & (ri < h)
        out = np.full(n, np.nan)
        out[ok] = band[ri[ok], ci[ok]]
        return out
    if kernel == "bilinear":
        size, off, min_valid = 2, 0, 2
    elif kernel == "bicubic":
        size, off, min_valid = 4, 1, 4
    elif kernel == "lanczos":
        size, off, min_valid = 6, 2, 4
    else:
        raise ValueError(kernel)
    c0 = np.floor(col_f).astype(np.int64) - off
    r0 = np.floor(row_f).astype(np.int64) - off
    # offsets (size,) per axis
    ks = np.arange(size)
    cols = c0[:, None] + ks[None, :]          # (n, size)
    rows = r0[:, None] + ks[None, :]
    dx = col_f[:, None] - cols                # distance to tap
    dy = row_f[:, None] - rows
    if kernel == "bilinear":
        wx = 1.0 - np.abs(dx)
        wy = 1.0 - np.abs(dy)
    elif kernel == "bicubic":
        wx = _keys_cubic(dx)
        wy = _keys_cubic(dy)
    else:
        wx = _lanczos(dx)
        wy = _lanczos(dy)
    in_c = (cols >= 0) & (cols < w)
    in_r = (rows >= 0) & (rows < h)
    cc = np.clip(cols, 0, w - 1)
    rr = np.clip(rows, 0, h - 1)
    vals = band[rr[:, :, None], cc[:, None, :]]       # (n, size_r, size_c)
    valid = (
        in_r[:, :, None] & in_c[:, None, :] & np.isfinite(vals)
    )
    wgt = (wy[:, :, None] * wx[:, None, :]) * valid
    tot = wgt.sum(axis=(1, 2))
    n_valid = valid.sum(axis=(1, 2))
    num = np.nansum(np.where(valid, vals, 0.0) * wgt, axis=(1, 2))
    with np.errstate(invalid="ignore", divide="ignore"):
        out = num / tot
    out[(n_valid < min_valid) | (np.abs(tot) < 1e-12)] = np.nan
    return out


def sample_cells(
    images: DataFrame,
    res: int,
    kernel: str = "bilinear",
    parent_res: int | None = None,
    dggs: str = "hex7",
    n_bands: int = MAX_BANDS_DEFAULT,
    max_cells_per_tile: int = 500_000,
) -> DataFrame:
    """Per-cell sampled values: (parent, cell, band_1..k), deduped
    deterministically across overlapping tiles (lowest image_id wins)."""
    if parent_res is None:
        parent_res = default_parent_res(res, dggs)
    bcols = band_cols(n_bands)
    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("parent", T.LongType(), False),
            T.StructField("cell", T.LongType(), False),
        ]
        + [T.StructField(c, T.DoubleType(), True) for c in bcols]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from raster2dggs_spark.dggs import cover
        from raster2dggs_spark.geo import (
            apply_affine,
            invert_affine,
            from_lonlat,
            to_lonlat,
        )

        for pdf in batches:
            out = []
            for row, arr in _decode_rows(pdf, None):
                k, h, w = arr.shape
                affine = (row.affine_a, row.affine_b, row.affine_c,
                          row.affine_d, row.affine_e, row.affine_f)
                # tile bbox in WGS84.  For geographic tiles the corners
                # suffice, but a straight projected edge (TM/LCC/polar)
                # BOWS in lon/lat (~x²·tanφ/2R over a TM half-width) —
                # larger than cover_bbox's 0.35×pitch safety margin at
                # fine res on large tiles — so densify the outline
                # before taking min/max (the latitude-distortion bug
                # class; see CLAUDE.md).
                if row.crs == "EPSG:4326":
                    cs = np.array([0.0, w, 0.0, w])
                    rs = np.array([0.0, 0.0, h, h])
                else:
                    t = np.linspace(0.0, 1.0, 9)
                    cs = np.concatenate(
                        [t * w, np.full_like(t, w), (1 - t) * w,
                         np.zeros_like(t)])
                    rs = np.concatenate(
                        [np.zeros_like(t), t * h, np.full_like(t, h),
                         (1 - t) * h])
                x, y = apply_affine(affine, cs, rs)
                lons, lats = to_lonlat(x, y, row.crs)
                # cover the tile bbox in bounded pieces: an extent too
                # large for one sampling pass is SPLIT (half-open bbox
                # halves partition the center-in-bbox set exactly — no
                # dup, no gap), never silently skipped (a dropped tile
                # would be an invisible hole in the output; 12% of the
                # bench tiles hit the cap at res 8 before round 4)
                pieces = [(lons.min(), lats.min(), lons.max(), lats.max())]
                covered = []
                while pieces:
                    x0, y0, x1, y1 = pieces.pop()
                    try:
                        covered.append(cover.cover_bbox(
                            x0, y0, x1, y1, res, dggs=dggs,
                            max_samples=max_cells_per_tile * 10,
                        ))
                    except ValueError:
                        if max(x1 - x0, y1 - y0) < 1e-9:
                            raise  # degenerate: not a size problem
                        if (x1 - x0) >= (y1 - y0):
                            xm = 0.5 * (x0 + x1)
                            pieces += [(x0, y0, xm, y1), (xm, y0, x1, y1)]
                        else:
                            ym = 0.5 * (y0 + y1)
                            pieces += [(x0, y0, x1, ym), (x0, ym, x1, y1)]
                cells = np.concatenate(covered) if covered else np.array([], dtype=np.int64)
                if cells.size == 0:
                    continue
                clon, clat = cover.cell_center(cells, dggs)
                # centroids come back in the canonical frame; an
                # antimeridian-crossing tile's affine lives in the
                # UNWRAPPED frame (lon up to >180) — unwrap the
                # centroids into the tile frame or the inverse affine
                # drops every far-seam cell (F14)
                mid = 0.5 * (lons.min() + lons.max())
                clon = clon + 360.0 * np.round((mid - clon) / 360.0)
                if row.crs == "EPSG:4326":
                    cx, cy = clon, clat
                else:
                    cx, cy = from_lonlat(clon, clat, row.crs)
                inv = invert_affine(affine)
                col_p, row_p = apply_affine(inv, cx, cy)
                # fractional pixel coords, centre registration (-0.5)
                col_f = col_p - 0.5
                row_f = row_p - 0.5
                # ownership: nearest pixel inside this tile
                nn_c = np.floor(col_f + 0.5).astype(np.int64)
                nn_r = np.floor(row_f + 0.5).astype(np.int64)
                own = (nn_c >= 0) & (nn_c < w) & (nn_r >= 0) & (nn_r < h)
                if not own.any():
                    continue
                cells, col_f, row_f = cells[own], col_f[own], row_f[own]
                data = {
                    "image_id": np.repeat(row.image_id, cells.shape[0]),
                    "parent": cover.cell_parent(cells, parent_res, dggs),
                    "cell": cells,
                }
                for i, c in enumerate(bcols):
                    if i < k:
                        data[c] = _stencil_sample(
                            arr[i].astype(np.float64), col_f, row_f, kernel
                        )
                    else:
                        data[c] = np.full(cells.shape[0], np.nan)
                out.append(pd.DataFrame(data))
            if out:
                yield pd.concat(out, ignore_index=True)

    raw = _prune(images).mapInPandas(fn, schema)
    # deterministic cross-tile dedupe (J4)
    from raster2dggs_spark.operators.aggregates import dedupe_first

    return dedupe_first(raw, ["cell"], ["image_id"]).drop("image_id")


def _tile_extent_deg(images: DataFrame) -> float | None:
    """Max tile extent in degrees — a single scalar agg over metadata
    columns only (bounded driver data, like the kNN radius stats).
    None when the image table is empty."""
    m = images.select(
        F.greatest(
            F.abs(F.col("affine_a")) * F.col("w"),
            F.abs(F.col("affine_e")) * F.col("h"),
        ).alias("ext"),
        F.col("crs"),
    ).select(
        F.when(F.col("crs") == "EPSG:4326", F.col("ext"))
        .otherwise(F.col("ext") / 111_195.0).alias("ext_deg")
    ).agg(F.max("ext_deg").alias("m")).collect()
    return None if m[0]["m"] is None else float(m[0]["m"])


def _routing_res(extent_deg: float) -> int:
    """Finest geohash res whose cell pitch still covers one tile — keeps
    the per-tile cover at ~<=9 cells while cells stay as small as the
    data allows (fewer candidate tiles per point)."""
    from raster2dggs_spark.dggs import cover

    r = 1
    while r < 12 and cover.pitch_deg(r + 1, "geohash") >= extent_deg:
        r += 1
    return r


def sample_points(
    images: DataFrame,
    points: DataFrame,
    kernel: str = "bilinear",
    n_bands: int = MAX_BANDS_DEFAULT,
    id_col: str = "point_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    strategy: str = "auto",
    broadcast_threshold: int = 64,
    force: bool = False,
) -> DataFrame:
    """Interpolate raster values at arbitrary lon/lat points (the vector-
    point extraction twin of ``sample_cells`` — same kernels, same
    center-registration -0.5 contract).

    Two physical strategies, same semantics (points covered by several
    tiles take the lowest image_id — the sample_cells dedupe rule;
    points outside every tile yield NaN):

    - ``collect`` — the image table is a small broadcast dimension:
      payloads ship in the UDF closure, the big point side is one
      ``mapInPandas`` pass with no shuffle.  Only safe for small image
      tables (driver memory!).
    - ``join`` — the 100-TB path, no driver collect of payloads: tile
      bboxes are covered with coarse geohash routing cells (pitch >= one
      tile, so <=~9 cells/tile), points encode to the same cells, and a
      cell equi-join routes each point to its candidate tiles; a cogroup
      on image_id then evaluates the kernel per tile group — each
      payload crosses the shuffle exactly once, points are the only
      replicated rows.  Ownership resolves with a deterministic
      dedupe-first, and a final left join restores the
      outside-every-tile NaN rows.

    ``auto`` probes ``limit(broadcast_threshold+1).count()`` (bounded
    work) and picks collect only for genuinely small image tables."""
    if strategy not in ("auto", "collect", "join"):
        raise ValueError(strategy)
    if strategy == "auto":
        n = _prune(images).limit(broadcast_threshold + 1).count()
        strategy = "collect" if n <= broadcast_threshold else "join"
    elif strategy == "collect" and not force:
        # hard guard (round-5 VERDICT #6): the collect path ships decoded
        # payloads in a UDF closure — refuse a forced collect on a big
        # image table instead of quietly OOMing the driver
        n = _prune(images).limit(broadcast_threshold + 1).count()
        if n > broadcast_threshold:
            raise ValueError(
                f"strategy='collect' on >{broadcast_threshold} images "
                "would ship all payloads through the driver; use "
                "strategy='join' (the scale path) or pass force=True"
            )
    if strategy == "join":
        return _sample_points_join(
            images, points, kernel, n_bands, id_col, lon_col, lat_col
        )
    img_rows = [r.asDict() for r in _prune(images).collect()]
    bcols = band_cols(n_bands)
    schema = T.StructType(
        [
            T.StructField(id_col, points.schema[id_col].dataType, False),
            T.StructField(lon_col, T.DoubleType(), False),
            T.StructField(lat_col, T.DoubleType(), False),
        ]
        + [T.StructField(c, T.DoubleType(), True) for c in bcols]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from types import SimpleNamespace

        from raster2dggs_spark.geo import (
            apply_affine,
            invert_affine,
            from_lonlat,
        )

        decoded = []  # (image_id, row, arr) lazily decoded once per task
        for d in sorted(img_rows, key=lambda d: d["image_id"]):
            row = SimpleNamespace(**d)
            for _, arr in _decode_rows(pd.DataFrame([d]), None):
                # float64 ONCE per task: converting inside the batch
                # loop re-copied every image per Arrow batch (a 2048^2
                # source at 1M points = ~8 GB of astype churn)
                decoded.append((row, arr.astype(np.float64)))
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            lon = pdf[lon_col].values.astype(np.float64)
            lat = pdf[lat_col].values.astype(np.float64)
            vals = {c: np.full(n, np.nan) for c in bcols}
            unset = np.ones(n, dtype=bool)
            for row, arr in decoded:
                k, h, w = arr.shape
                affine = (row.affine_a, row.affine_b, row.affine_c,
                          row.affine_d, row.affine_e, row.affine_f)
                if row.crs == "EPSG:4326":
                    # unwrap canonical point lons into the tile's
                    # (possibly antimeridian-crossing) affine frame
                    mid = affine[2] + affine[0] * w / 2.0
                    px = lon + 360.0 * np.round((mid - lon) / 360.0)
                    py = lat
                else:
                    px, py = from_lonlat(lon, lat, row.crs)
                inv = invert_affine(affine)
                col_p, row_p = apply_affine(inv, px, py)
                col_f = col_p - 0.5
                row_f = row_p - 0.5
                hit = unset & (col_p >= 0) & (col_p <= w) & (row_p >= 0) & (row_p <= h)
                if not hit.any():
                    continue
                for i, c in enumerate(bcols):
                    if i < k:
                        vals[c][hit] = _stencil_sample(
                            arr[i], col_f[hit], row_f[hit], kernel,
                        )
                unset &= ~hit
            data = {id_col: pdf[id_col].values, lon_col: lon, lat_col: lat}
            data.update(vals)
            yield pd.DataFrame(data)

    return points.mapInPandas(fn, schema)


def _sample_points_join(
    images: DataFrame,
    points: DataFrame,
    kernel: str,
    n_bands: int,
    id_col: str,
    lon_col: str,
    lat_col: str,
) -> DataFrame:
    """The no-driver-collect strategy of ``sample_points`` (see there)."""
    from raster2dggs_spark.operators.aggregates import dedupe_first

    bcols = band_cols(n_bands)
    extent = _tile_extent_deg(images)
    if extent is None:
        # empty image table: collect-path parity — every point comes
        # back with NaN bands
        return points.select(
            F.col(id_col), F.col(lon_col).cast("double").alias(lon_col),
            F.col(lat_col).cast("double").alias(lat_col),
            *[F.lit(float("nan")).alias(c) for c in bcols],
        )
    imgs = _prune(images)

    # --- tile side: (image_id, routing res, routing cell) for every
    # cell whose area intersects the tile bbox (cover padded by one cell
    # pitch — guarantees any point inside the tile shares a cell).  The
    # routing res is PER TILE (finest geohash precision that still
    # covers the tile in ~<=9 cells): a single-global-res routing
    # degenerates the moment tile sizes are heterogeneous — one 30°
    # outlier scenario dragged the global res to precision 1 (32 cells
    # on Earth), every point joined ~hundreds of tiles, and the cogroup
    # did near-cross-join work (round-4 profile: 30 s → 4 s at 4096
    # tiles / 65k points).  Metadata-only scan: payload bytes never
    # enter this pass -------------------------------------------------
    meta = images.select(
        "image_id", "w", "h", "affine_a", "affine_b", "affine_c",
        "affine_d", "affine_e", "affine_f", "crs",
    )
    tc_schema = T.StructType([
        T.StructField("image_id", T.StringType(), False),
        T.StructField("__rres", T.IntegerType(), False),
        T.StructField("__cell", T.LongType(), False),
        T.StructField("__lon_min", T.DoubleType(), False),
        T.StructField("__lon_max", T.DoubleType(), False),
        T.StructField("__lat_min", T.DoubleType(), False),
        T.StructField("__lat_max", T.DoubleType(), False),
    ])

    def tile_cells(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from raster2dggs_spark.dggs import cover
        from raster2dggs_spark.geo import apply_affine, to_lonlat

        for pdf in batches:
            ids, rrs, cells = [], [], []
            bbs: list = []
            for row in pdf.itertuples(index=False):
                affine = (row.affine_a, row.affine_b, row.affine_c,
                          row.affine_d, row.affine_e, row.affine_f)
                cs = np.array([0.0, row.w, 0.0, row.w])
                rs = np.array([0.0, 0.0, row.h, row.h])
                x, y = apply_affine(affine, cs, rs)
                lons, lats = to_lonlat(x, y, row.crs)
                ext = max(lons.max() - lons.min(), lats.max() - lats.min())
                rres = _routing_res(ext)
                pitch = cover.pitch_deg(rres, "geohash")
                c = cover.cover_bbox(
                    lons.min() - pitch, max(-90.0, lats.min() - pitch),
                    lons.max() + pitch, min(90.0, lats.max() + pitch),
                    rres, dggs="geohash",
                )
                ids.append(np.repeat(row.image_id, c.shape[0]))
                rrs.append(np.full(c.shape[0], rres, dtype=np.int32))
                cells.append(c.astype(np.int64))
                bbs.append((float(lons.min()), float(lons.max()),
                            float(lats.min()), float(lats.max()),
                            c.shape[0]))
            if ids:
                yield pd.DataFrame({
                    "image_id": np.concatenate(ids),
                    "__rres": np.concatenate(rrs),
                    "__cell": np.concatenate(cells),
                    "__lon_min": np.concatenate(
                        [np.full(b[4], b[0]) for b in bbs]),
                    "__lon_max": np.concatenate(
                        [np.full(b[4], b[1]) for b in bbs]),
                    "__lat_min": np.concatenate(
                        [np.full(b[4], b[2]) for b in bbs]),
                    "__lat_max": np.concatenate(
                        [np.full(b[4], b[3]) for b in bbs]),
                })

    tc = meta.mapInPandas(tile_cells, tc_schema)
    # distinct routing resolutions actually in use: bounded driver data
    # (<=12 geohash precisions — same class as the kNN radius aggs);
    # eager localCheckpoint so the metadata pass runs once (res_list
    # collect + join both read the checkpoint) and the blocks' lifetime
    # is tied to the returned plan, not the session (a bare persist()
    # here leaked one cached RDD per invocation — round-4 ADVICE)
    tc = tc.localCheckpoint(eager=True)
    res_list = sorted(
        r["__rres"] for r in tc.select("__rres").distinct().collect()
    )

    # --- point side: encode to the routing cells at EVERY res in use
    # (points replicate |res_list|× — typically 1-3 rows — instead of
    # tiles replicating into a degenerate coarse grid) ------------------
    @F.pandas_udf(T.LongType())
    def pt_cell(lon: pd.Series, lat: pd.Series, rr: pd.Series) -> pd.Series:
        from raster2dggs_spark.dggs import cover

        out = np.empty(len(lon), dtype=np.int64)
        lonv = lon.values.astype(np.float64)
        latv = lat.values.astype(np.float64)
        rrv = rr.values
        for r in np.unique(rrv):
            m = rrv == r
            out[m] = cover.encode(lonv[m], latv[m], int(r), "geohash")
        return pd.Series(out)

    pt = points.select(
        F.col(id_col), F.col(lon_col).cast("double").alias(lon_col),
        F.col(lat_col).cast("double").alias(lat_col),
    ).withColumn(
        "__rres",
        F.explode(F.array(*[F.lit(int(r)) for r in res_list])),
    ).withColumn(
        "__cell", pt_cell(F.col(lon_col), F.col(lat_col), F.col("__rres"))
    )
    # EXACT per-tile bbox prefilter (native exprs) after the routing
    # equi-join: routing cells are only bbox-granular, and a long-thin
    # tile (the bench's 0.9°×60° geodesic strips) routes at a res whose
    # cells dwarf its true footprint — without this cut one such tile
    # collects every point in a 45° routing cell (measured: 11.6M
    # candidate rows for 65k points, p99 group 23k — the
    # sample_points_join variance in round-4's VERDICT #4).  The bbox
    # test keeps a SUPERSET of true hits (the cogroup kernel re-checks
    # exactly), so results are unchanged; candidates drop to ~hit scale
    # and the hot cogroup groups disappear.  Point lons unwrap into the
    # tile's frame first (antimeridian tiles, F14).
    eps = 1e-6
    mid = (F.col("__lon_min") + F.col("__lon_max")) / 2.0
    lon_u = (F.col(lon_col)
             + 360.0 * F.round((mid - F.col(lon_col)) / 360.0))
    cand = (
        pt.join(tc, ["__rres", "__cell"])
        .where(
            (lon_u >= F.col("__lon_min") - eps)
            & (lon_u <= F.col("__lon_max") + eps)
            & (F.col(lat_col) >= F.col("__lat_min") - eps)
            & (F.col(lat_col) <= F.col("__lat_max") + eps)
        )
        .drop("__rres", "__cell",
              "__lon_min", "__lon_max", "__lat_min", "__lat_max")
    )

    # --- kernel per tile group (cogroup: payload crosses the shuffle
    # exactly once; candidate points are the replicated side) -----------
    hit_schema = T.StructType(
        [
            T.StructField(id_col, points.schema[id_col].dataType, False),
            T.StructField("image_id", T.StringType(), False),
        ]
        + [T.StructField(c, T.DoubleType(), True) for c in bcols]
    )
    kern = kernel

    def eval_group(limgs: pd.DataFrame, lpts: pd.DataFrame) -> pd.DataFrame:
        from raster2dggs_spark.geo import (
            apply_affine, invert_affine, from_lonlat,
        )

        if not len(limgs) or not len(lpts):
            return pd.DataFrame(
                {id_col: [], "image_id": [], **{c: [] for c in bcols}}
            )
        out = []
        lon = lpts[lon_col].values.astype(np.float64)
        lat = lpts[lat_col].values.astype(np.float64)
        for row, arr in _decode_rows(limgs, None):
            k, h, w = arr.shape
            affine = (row.affine_a, row.affine_b, row.affine_c,
                      row.affine_d, row.affine_e, row.affine_f)
            if row.crs == "EPSG:4326":
                # unwrap into the tile frame (see the cogroup kernel)
                mid = affine[2] + affine[0] * w / 2.0
                px = lon + 360.0 * np.round((mid - lon) / 360.0)
                py = lat
            else:
                px, py = from_lonlat(lon, lat, row.crs)
            inv = invert_affine(affine)
            col_p, row_p = apply_affine(inv, px, py)
            hit = (col_p >= 0) & (col_p <= w) & (row_p >= 0) & (row_p <= h)
            if not hit.any():
                continue
            col_f = col_p[hit] - 0.5
            row_f = row_p[hit] - 0.5
            data = {
                id_col: lpts[id_col].values[hit],
                "image_id": np.repeat(row.image_id, int(hit.sum())),
            }
            for i, c in enumerate(bcols):
                if i < k:
                    data[c] = _stencil_sample(
                        arr[i].astype(np.float64), col_f, row_f, kern
                    )
                else:
                    data[c] = np.full(int(hit.sum()), np.nan)
            out.append(pd.DataFrame(data))
        if not out:
            return pd.DataFrame(
                {id_col: [], "image_id": [], **{c: [] for c in bcols}}
            )
        return pd.concat(out, ignore_index=True)

    # prune payloads BEFORE the cogroup shuffle: a tile with no
    # candidate points would otherwise ship its bytes through the
    # exchange just to be dropped in eval_group — at scale (sparse
    # point sets over a global tile table) that is most of the shuffle.
    # localCheckpoint (not persist): computed once, reused by the
    # semi-join and the cogroup, released with the plan
    cand = cand.localCheckpoint(eager=True)
    imgs = imgs.join(cand.select("image_id").distinct(), "image_id",
                     "left_semi")
    hits = (
        imgs.groupby("image_id")
        .cogroup(cand.groupby("image_id"))
        .applyInPandas(eval_group, hit_schema)
    )

    # ownership: lowest image_id wins (sample_cells J4 rule)
    owned = dedupe_first(hits, [id_col], ["image_id"]).drop("image_id")

    # restore outside-every-tile points as NaN rows (collect-path parity:
    # NaN, not NULL) — against the ORIGINAL point rows, not the
    # per-routing-res exploded side
    base_pts = points.select(
        F.col(id_col), F.col(lon_col).cast("double").alias(lon_col),
        F.col(lat_col).cast("double").alias(lat_col),
    )
    out = base_pts.join(owned, id_col, "left")
    return out.select(
        id_col, lon_col, lat_col,
        *[
            F.coalesce(F.col(c), F.lit(float("nan"))).alias(c)
            for c in bcols
        ],
    )


def warp_grid(
    images: DataFrame,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
    crs_out: str = "EPSG:3857",
    kernel: str = "bilinear",
    n_bands: int = MAX_BANDS_DEFAULT,
    strategy: str = "auto",
) -> DataFrame:
    """Raster reprojection onto a regular target grid — the gdalwarp /
    rasterio ``WarpedVRT`` workload (the reference warps arbitrary-CRS
    rasters through WarpedVRT before indexing,
    /root/reference/raster2dggs/common.py:803-813; this engine indexes
    any supported CRS natively, so warp is exposed as its own export
    operator instead of a hidden ingest step).

    ``bbox`` = (minx, miny, maxx, maxy) in ``crs_out`` units, row 0 at
    the top — output one row per target pixel ``(px, py, lon, lat,
    band_1..band_n)``, NaN outside every source tile.

    Composition, not new machinery: the target lattice comes from
    ``spark.range`` (no scan, even partitions), pixel centres
    inverse-project to lon/lat in one Arrow-batched pass (NumPy CRS
    dispatch), and the interpolation IS :func:`sample_points` — so the
    warp inherits its two physical strategies (broadcast ``collect``
    for small image dims, the cell-routed ``join`` path at 100 TB) and
    its kernels (nearest/bilinear/bicubic/lanczos) unchanged.
    """
    spark = images.sparkSession
    if width <= 0 or height <= 0:
        raise ValueError("width/height must be positive")
    minx, miny, maxx, maxy = (float(v) for v in bbox)
    dx = (maxx - minx) / width
    dy = (maxy - miny) / height
    lattice = spark.range(width * height).select(
        F.col("id").alias("point_id"),
        (F.col("id") % width).alias("px"),
        F.expr(f"id DIV {width}").alias("py"))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from raster2dggs_spark.geo.crs import to_lonlat

        for pdf in batches:
            px = pdf["px"].to_numpy()
            py = pdf["py"].to_numpy()
            xs = minx + (px + 0.5) * dx
            ys = maxy - (py + 0.5) * dy
            lon, lat = to_lonlat(xs, ys, crs_out)
            yield pd.DataFrame({"point_id": pdf["point_id"].to_numpy(),
                                "lon": lon, "lat": lat})

    pts = lattice.mapInPandas(
        fn, "point_id long, lon double, lat double")
    out = sample_points(images, pts, kernel=kernel, n_bands=n_bands,
                        strategy=strategy)
    bcols = [c for c in out.columns if c.startswith("band_")]
    return out.select(
        (F.col("point_id") % width).alias("px"),
        F.expr(f"point_id DIV {width}").alias("py"),
        "lon", "lat", *bcols)
