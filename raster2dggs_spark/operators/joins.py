"""Cell-index-powered spatial joins — SURVEY.md §2.3 J5–J7 (north rule).

The DGGS index converts geometric theta-joins into *equi-joins on the cell
key* that Catalyst can broadcast/hash/sort-merge:

- J5 point-in-polygon: polygons → cover cells (interior / boundary
  classified) → equi-join on cell → exact vectorized ray-cast refinement
  only for boundary-cell candidates.
- J6 kNN: targets indexed once; each query enumerates candidate cells in
  an expanding radius → equi-join → windowed top-k by exact haversine.
  (Radius expansion replaces libh3 ``grid_disk`` ring expansion — same
  candidate semantics, no base-cell neighbor tables needed.)
- J7 zonal: zone covers joined to any cell-keyed table → per-zone
  aggregation; a plain shuffled hash join Catalyst already optimizes.

Polygon sides are small in practice → ``F.broadcast`` hints; the point
side never shuffles for PIP (broadcast hash join), and kNN shuffles once
on the cell key.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EARTH_R = 6371007.1809


# ---------------------------------------------------------------------------
# geometry kernels (pure NumPy — no shapely offline)
# ---------------------------------------------------------------------------

def raycast_contains(lon, lat, vx, vy):
    """Vectorized even-odd ray casting: points (n,) vs one polygon
    (vx, vy vertex arrays, closed implicitly).  Strict-interior for points
    off edges; on-edge behavior is half-open (consistent, measure-zero)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    vx = np.asarray(vx, dtype=np.float64)
    vy = np.asarray(vy, dtype=np.float64)
    n = len(vx)
    inside = np.zeros(lon.shape[0], dtype=bool)
    j = n - 1
    for i in range(n):
        xi, yi = vx[i], vy[i]
        xj, yj = vx[j], vy[j]
        crosses = ((yi > lat) != (yj > lat)) & (
            lon < (xj - xi) * (lat - yi) / (yj - yi + 1e-300) + xi
        )
        inside ^= crosses
        j = i
    return inside


def _point_segment_dist_deg(lon, lat, x1, y1, x2, y2):
    """Approx point-to-segment distance in degrees (equirect local)."""
    px = np.asarray(lon) - x1
    py = np.asarray(lat) - y1
    dx, dy = x2 - x1, y2 - y1
    denom = dx * dx + dy * dy
    t = np.clip((px * dx + py * dy) / (denom + 1e-300), 0.0, 1.0)
    ex = px - t * dx
    ey = py - t * dy
    return np.sqrt(ex * ex + ey * ey)


def _pitch_deg(res: int, dggs: str) -> float:
    from raster2dggs_spark.dggs import cover

    return cover.pitch_deg(res, dggs)


def _cells_children(cells, res: int, dggs: str):
    """All direct children of ``cells`` (at ``res``) — pure id arithmetic.

    hex7: uniform 7-ary digit tree (clear the res-(res+1) digit, bump the
    res nibble, OR in digit 0..6).  S2: the 4 children ids are
    ``id + {-3,-1,1,3}·(lsb>>2)`` (standard S2 id arithmetic).  rhp:
    base-9 append.  geohash: 5-bit append (32 children)."""
    cells = np.asarray(cells, dtype=np.int64)
    if dggs == "hex7":
        r1 = res + 1
        shift = 3 * (15 - r1)
        base = (
            (cells & ~np.int64(0xF << 52) & ~np.int64(7 << shift))
            | np.int64(r1 << 52)
        )
        digits = (np.arange(7, dtype=np.int64) << shift)
        return (base[:, None] | digits[None, :]).ravel()
    if dggs == "rhp":
        from raster2dggs_spark.dggs import rhplib

        return rhplib.cell_to_children(cells, res)
    if dggs == "geohash":
        bits = cells >> 4
        kids = ((bits[:, None] << 5)
                | np.arange(32, dtype=np.int64)[None, :]).ravel()
        return (kids << 4) | (res + 1)
    if dggs == "s2":
        lsb = cells & -cells
        q = lsb >> 2
        offs = np.array([-3, -1, 1, 3], dtype=np.int64)
        return (cells[:, None] + offs[None, :] * q[:, None]).ravel()
    if dggs == "maidenhead":
        from raster2dggs_spark.dggs.maidenheadlib import BASES

        b = BASES[res]  # next pair's base; children = b^2 mixed-radix append
        bits = cells >> 4
        kids = (bits[:, None] * (b * b)
                + np.arange(b * b, dtype=np.int64)[None, :]).ravel()
        return (kids << 4) | (res + 1)
    if dggs == "a5":
        from raster2dggs_spark.dggs import a5lib

        return a5lib.cell_to_children(cells).ravel()
    if dggs == "i4r":
        from raster2dggs_spark.dggs import i4rlib

        return i4rlib.cell_to_children(cells).ravel()
    if dggs == "i9r":
        from raster2dggs_spark.dggs import i9rlib

        return i9rlib.cell_to_children(cells).ravel()
    if dggs == "e4r":
        from raster2dggs_spark.dggs import e4rlib

        return e4rlib.cell_to_children(cells).ravel()
    if dggs == "e9r":
        from raster2dggs_spark.dggs import e9rlib

        return e9rlib.cell_to_children(cells).ravel()
    if dggs == "quadkey":
        from raster2dggs_spark.dggs import quadkeylib

        return quadkeylib.cell_to_children(cells, res + 1).ravel()
    raise ValueError(f"children arithmetic not implemented for {dggs!r}")


def _centers_edge_dist(cells, vx, vy, dggs: str):
    """(center_in, min-edge-distance-deg) for every cell center."""
    from raster2dggs_spark.dggs import cover

    clon, clat = cover.cell_center(cells, dggs)
    center_in = raycast_contains(clon, clat, vx, vy)
    mind = np.full(cells.shape[0], np.inf)
    n = len(vx)
    j = n - 1
    for i in range(n):
        d = _point_segment_dist_deg(clon, clat, vx[j], vy[j], vx[i], vy[i])
        mind = np.minimum(mind, d)
        j = i
    return center_in, mind


_SEED_MAX = 48  # max lattice samples per axis at the seed resolution


def polygon_cover_cells(vx, vy, res: int, dggs: str = "hex7"):
    """Cover a polygon with cells at ``res``; classify interior vs
    boundary.  A cell is *interior* when its center is inside and farther
    than 1.3 pitch from every edge — matches only need refinement in
    boundary cells (J5 strategy, SURVEY.md §2.3).

    Coarse-to-fine descent: seed with a bounded lattice at the coarsest
    resolution whose bbox fits ``_SEED_MAX`` steps per axis, then recurse
    level by level through *boundary* cells only; interior cells expand
    to descendants by pure id arithmetic.  Work is
    O(area-in-cells + perimeter·depth) — a continent at res 9 no longer
    samples a dense O((extent/pitch)²) lattice (the flat version's
    failure mode at scale)."""
    from raster2dggs_spark.dggs import cover

    vx = np.asarray(vx, dtype=np.float64)
    vy = np.asarray(vy, dtype=np.float64)
    lon_min, lon_max = vx.min(), vx.max()
    lat_min, lat_max = vy.min(), vy.max()
    extent = max(lon_max - lon_min, lat_max - lat_min)
    # halo multiple of pitch that bounds a cell circumradius (hex:
    # ~0.58·pitch; s2 cells distort up to ~1.4× the nominal edge)
    halo = 1.5 if dggs == "hex7" else 2.0
    # edge distances are measured in raw lon/lat degrees, but a cell's
    # lon extent grows by 1/cos(lat) — scale the descent margins so a
    # "deep interior" verdict holds for every descendant at any latitude
    maxlat = min(89.0, max(abs(lat_min), abs(lat_max)))
    distort = 1.0 / max(0.1, float(np.cos(np.radians(maxlat))))
    r0 = res
    while r0 > 0 and extent / (0.35 * _pitch_deg(r0, dggs)) > _SEED_MAX:
        r0 -= 1

    # --- seed: dense-but-bounded lattice at r0 -------------------------
    pitch0 = _pitch_deg(r0, dggs)
    step = pitch0 * 0.35
    pad = pitch0
    lons = np.arange(lon_min - pad, lon_max + pad + step, step)
    lats = np.arange(lat_min - pad, lat_max + pad + step, step)
    glon = np.repeat(lons, lats.size)
    glat = np.tile(lats, lons.size)
    keep = raycast_contains(glon, glat, vx, vy)
    near = np.zeros_like(keep)
    n = len(vx)
    j = n - 1
    for i in range(n):
        near |= _point_segment_dist_deg(glon, glat, vx[j], vy[j], vx[i], vy[i]) <= (
            halo * pitch0
        )
        j = i
    sel = keep | near
    if not sel.any():
        return (np.empty(0, np.int64), np.empty(0, bool), np.empty(0, bool))
    cells = np.unique(cover.encode(glon[sel], glat[sel], r0, dggs))

    # --- descend: boundary cells refine, interior cells expand ---------
    interior_pool: list[tuple[np.ndarray, int]] = []
    for r in range(r0, res):
        pitch_r = _pitch_deg(r, dggs)
        center_in, mind = _centers_edge_dist(cells, vx, vy, dggs)
        # descendants of a cell wander up to ~1.2 pitch from its center
        # (circumradius + aperture-7/4 center drift), times the lon
        # distortion — only promote cells whose whole descendant union
        # is provably inside
        deep = center_in & (mind > 1.5 * distort * pitch_r)
        if deep.any():
            interior_pool.append((cells[deep], r))
        band = ~deep & (center_in | (mind <= halo * distort * pitch_r))
        cells = _cells_children(cells[band], r, dggs)
        if cells.size == 0:
            break

    # --- final classification at res ------------------------------------
    # same 1/cos(lat) lon-distortion factor as the descent margins: edge
    # distances are raw degrees but a cell's lon extent is ~pitch/cos(lat),
    # so without it a high-latitude edge-straddling cell could be marked
    # interior and skip the exact raycast
    pitch_deg = _pitch_deg(res, dggs)
    if cells.size:
        center_in, mind = _centers_edge_dist(cells, vx, vy, dggs)
        interior = center_in & (mind > 1.3 * distort * pitch_deg)
        boundary = ~interior & (center_in | (mind <= 1.3 * distort * pitch_deg))
        sel2 = interior | boundary
        out_cells = [cells[sel2]]
        out_int = [interior[sel2]]
        out_cin = [center_in[sel2]]
    else:
        out_cells, out_int, out_cin = [], [], []

    # expand the interior pool to res-level descendants (id arithmetic)
    for pool_cells, r in interior_pool:
        c = pool_cells
        for rr in range(r, res):
            c = _cells_children(c, rr, dggs)
        out_cells.append(c)
        out_int.append(np.ones(c.shape[0], dtype=bool))
        out_cin.append(np.ones(c.shape[0], dtype=bool))

    if not out_cells:
        return (np.empty(0, np.int64), np.empty(0, bool), np.empty(0, bool))
    return (
        np.concatenate(out_cells),
        np.concatenate(out_int),
        np.concatenate(out_cin),
    )


# ---------------------------------------------------------------------------
# Spark-side operators
# ---------------------------------------------------------------------------

POLY_SCHEMA = T.StructType([
    T.StructField("poly_id", T.LongType(), False),
    T.StructField("xs", T.ArrayType(T.DoubleType()), False),
    T.StructField("ys", T.ArrayType(T.DoubleType()), False),
])


def index_points(points: DataFrame, res: int, dggs: str = "hex7",
                 lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Add a ``cell`` column (Arrow-vectorized batch encode; a *map*, not
    a shuffle — J1)."""
    from raster2dggs_spark.dggs import check_grid

    check_grid(dggs)

    @F.pandas_udf(T.LongType())
    def enc(lon: pd.Series, lat: pd.Series) -> pd.Series:
        from raster2dggs_spark.dggs import cover

        return pd.Series(cover.encode(lon.values, lat.values, res, dggs))

    return points.withColumn("cell", enc(F.col(lon_col), F.col(lat_col)))


def polygon_cells(polys: DataFrame, res: int, dggs: str = "hex7") -> DataFrame:
    """Explode polygons to (poly_id, cell, interior) cover rows."""
    schema = T.StructType([
        T.StructField("poly_id", T.LongType(), False),
        T.StructField("cell", T.LongType(), False),
        T.StructField("interior", T.BooleanType(), False),
        T.StructField("center_in", T.BooleanType(), False),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                cells, interior, center_in = polygon_cover_cells(
                    np.asarray(row.xs), np.asarray(row.ys), res, dggs
                )
                out.append(pd.DataFrame({
                    "poly_id": np.repeat(np.int64(row.poly_id), cells.shape[0]),
                    "cell": cells,
                    "interior": interior,
                    "center_in": center_in,
                }))
            if out:
                yield pd.concat(out, ignore_index=True)

    return polys.mapInPandas(fn, schema)


def _ragged(lo: np.ndarray, hi: np.ndarray):
    """Flatten per-row integer ranges [lo_i, hi_i] (empty when hi < lo)
    into (row_index, value) arrays."""
    counts = np.maximum(hi - lo + 1, 0).astype(np.int64)
    total = int(counts.sum())
    idx = np.repeat(np.arange(lo.shape[0]), counts)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    seq = np.arange(total) - np.repeat(starts, counts)
    return idx, np.repeat(lo, counts) + seq


def polygon_fill_cells(polys: DataFrame, res: int, dggs: str = "hex7",
                       id_col: str = "poly_id", xs_col: str = "xs",
                       ys_col: str = "ys") -> DataFrame:
    """Polygon -> cells whose CENTER lies inside (h3 ``polyfill`` /
    vector2dggs polygon semantics; ref `common.py` cell-enumeration
    capability generalized from bboxes to arbitrary rings).

    - **Rectangle grids (quadkey / geohash): EXACT scanline.**  The ring
      maps into the grid's continuous tile space (lon linear; quadkey's
      N-S axis through Mercator ``fy`` — edges are straight lines of
      the grid's own planar space), each tile-row center's edge
      crossings are enumerated analytically (half-open even-odd rule),
      and crossings pair left/right into spans of interior centers.
      Nothing sampled, nothing missed.
    - **Curved grids**: the guaranteed-density cover machinery
      (``polygon_cells``) filtered to center-in rows; edges are
      straight in lon/lat there (documented contract difference).

    Scale shape: one narrow ``mapInPandas`` — a polygon is scanned,
    paired and expanded entirely inside its task, vectorized across the
    batch's edges; no shuffle, no cross-task state."""
    from raster2dggs_spark.dggs import check_grid

    check_grid(dggs)
    if dggs not in ("quadkey", "geohash"):
        return (polygon_cells(polys, res, dggs)
                .where(F.col("center_in"))
                .select(F.col("poly_id").alias(id_col), "cell"))

    schema = T.StructType([
        T.StructField(id_col, T.LongType(), False),
        T.StructField("cell", T.LongType(), False),
    ])

    def _axes():
        if dggs == "quadkey":
            from raster2dggs_spark.dggs import quadkeylib

            n = 1 << res

            def fy(lat):
                phi = np.radians(np.clip(lat, -quadkeylib.MAX_LAT,
                                         quadkeylib.MAX_LAT))
                return (1.0 - np.log(np.tan(phi) + 1.0 / np.cos(phi))
                        / np.pi) / 2.0

            return (lambda lon: (lon + 180.0) / 360.0 * n,
                    lambda lat: fy(lat) * n, n, n,
                    lambda ix, iy: quadkeylib.tile_to_cell(ix, iy, res))
        from raster2dggs_spark.dggs import geohashlib

        nbits = 5 * res
        nx, ny = 1 << ((nbits + 1) // 2), 1 << (nbits // 2)
        return (lambda lon: (lon + 180.0) / 360.0 * nx,
                lambda lat: (lat + 90.0) / 180.0 * ny, nx, ny,
                lambda ix, iy: geohashlib.cell_from_indices(ix, iy, res))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ufun, vfun, nx, ny, make = _axes()
        for pdf in batches:
            if not len(pdf):
                continue
            pids, ex0, ey0, ex1, ey1 = [], [], [], [], []
            for row in pdf.itertuples(index=False):
                xs = np.asarray(getattr(row, xs_col), dtype=np.float64)
                ys = np.asarray(getattr(row, ys_col), dtype=np.float64)
                if xs.shape[0] < 3:
                    continue
                pids.append(np.repeat(np.int64(getattr(row, id_col)),
                                      xs.shape[0]))
                ex0.append(xs); ey0.append(ys)
                ex1.append(np.roll(xs, -1)); ey1.append(np.roll(ys, -1))
            if not pids:
                continue
            pid = np.concatenate(pids)
            u0 = ufun(np.concatenate(ex0)); u1 = ufun(np.concatenate(ex1))
            v0 = vfun(np.concatenate(ey0)); v1 = vfun(np.concatenate(ey1))
            a = np.minimum(v0, v1)
            b = np.maximum(v0, v1)
            # rows whose center vc = iy + 0.5 satisfies a <= vc < b
            # (half-open even-odd: shared vertices count exactly once)
            row_lo = np.ceil(a - 0.5).astype(np.int64)
            row_hi = (np.ceil(b - 0.5) - 1.0).astype(np.int64)
            if int(np.maximum(row_hi - row_lo + 1, 0).sum()) > 5_000_000:
                raise ValueError(
                    "polygon_fill_cells: a batch spans >5M scan rows at "
                    f"res {res}; use a coarser res or split polygons")
            ei, iy = _ragged(row_lo, row_hi)
            vc = iy.astype(np.float64) + 0.5
            with np.errstate(divide="ignore", invalid="ignore"):
                t = (vc - v0[ei]) / (v1[ei] - v0[ei])
            uc = u0[ei] + (u1[ei] - u0[ei]) * t
            # pair crossings left->right per (poly, row)
            o = np.lexsort((uc, iy, pid[ei]))
            sp, siy, suc = pid[ei][o], iy[o], uc[o]
            new = np.ones(sp.shape[0], dtype=bool)
            new[1:] = (sp[1:] != sp[:-1]) | (siy[1:] != siy[:-1])
            cum = np.arange(sp.shape[0]) - np.maximum.accumulate(
                np.where(new, np.arange(sp.shape[0]), 0))
            left = cum % 2 == 0
            ul, ur = suc[left], suc[~left]
            lp, liy = sp[left], siy[left]
            ix_lo = np.ceil(ul - 0.5).astype(np.int64)
            ix_hi = (np.ceil(ur - 0.5) - 1.0).astype(np.int64)
            si, ix = _ragged(ix_lo, ix_hi)
            ix = np.mod(ix, nx)
            out = pd.DataFrame({
                id_col: lp[si],
                "cell": make(ix, np.clip(liy[si], 0, ny - 1)),
            })
            yield out.drop_duplicates(ignore_index=True)

    return polys.mapInPandas(fn, schema)


def line_cells(lines: DataFrame, res: int, dggs: str = "hex7",
               step_frac: float = 0.2,
               id_col: str = "line_id", xs_col: str = "xs",
               ys_col: str = "ys") -> DataFrame:
    """Explode polylines to DISTINCT (line_id, cell) traversal rows —
    the vector2dggs linestring workload (roads / rivers / tracks onto
    the grid).

    Semantics, per grid family:

    - **Rectangle grids (quadkey / geohash / maidenhead): EXACT
      supercover.**  Each segment is mapped into the grid's continuous
      index space (lon linear; quadkey's N-S axis through the Mercator
      ``fy``, so it is exact at any latitude — no cos(lat) anywhere,
      the repo's latitude-distortion bug class can't apply), every
      grid-line crossing parameter ``t`` is enumerated analytically,
      and the midpoint of each consecutive ``t`` pair names the cell
      of that sub-span.  No sampling, nothing missed; corner-touched
      cells of zero intersection length are (correctly) excluded.
    - **Curved grids: densified sampling** at ``step_frac`` of the
      cell pitch per axis in CELL units (E-W arc scaled by cos of the
      segment's smallest |lat| — the conservative-large factor), the
      reference's densified-footprint approach (F16) applied to 1-D
      geometry; cells whose intersection is shorter than the step can
      be missed (documented contract).

    Scale shape: one narrow ``mapInPandas`` — a line row is traversed,
    encoded and deduped entirely in its task (vectorized over all of a
    batch's segments at once); no shuffle, no cross-task state.
    """
    from raster2dggs_spark.dggs import check_grid

    check_grid(dggs)
    schema = T.StructType([
        T.StructField("line_id", T.LongType(), False),
        T.StructField("cell", T.LongType(), False),
    ])
    # power-of-2 grids only: u = frac * 2^k is EXACT scaling, so
    # floor(u) is bit-identical to the lib encode's quantizer;
    # maidenhead's mixed-radix digit-peel rounds per level and
    # would disagree on boundary-grazing spans -> sampling branch
    rect = dggs in ("quadkey", "geohash")

    def _axes(cover):
        """(u(lon), v(lat), nx, ny, from_indices) for rectangle grids."""
        if dggs == "quadkey":
            from raster2dggs_spark.dggs import quadkeylib

            n = 1 << res

            def fy(lat):
                phi = np.radians(np.clip(lat, -quadkeylib.MAX_LAT,
                                         quadkeylib.MAX_LAT))
                return (1.0 - np.log(np.tan(phi) + 1.0 / np.cos(phi))
                        / np.pi) / 2.0

            return (lambda lon: (lon + 180.0) / 360.0 * n,
                    lambda lat: fy(lat) * n, n, n,
                    lambda ix, iy: quadkeylib.tile_to_cell(ix, iy, res))
        if dggs == "geohash":
            from raster2dggs_spark.dggs import geohashlib

            nbits = 5 * res
            nx, ny = 1 << ((nbits + 1) // 2), 1 << (nbits // 2)
            return (lambda lon: (lon + 180.0) / 360.0 * nx,
                    lambda lat: (lat + 90.0) / 180.0 * ny, nx, ny,
                    lambda ix, iy: geohashlib.cell_from_indices(
                        ix, iy, res))
        from raster2dggs_spark.dggs import maidenheadlib

        n = 1
        for b in maidenheadlib.BASES[:res]:
            n *= b
        return (lambda lon: (lon + 180.0) / 360.0 * n,
                lambda lat: (lat + 90.0) / 180.0 * n, n, n,
                lambda ix, iy: maidenheadlib.cell_from_indices(
                    ix, iy, res))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from raster2dggs_spark.dggs import cover

        def _ragged(counts):
            total = int(counts.sum())
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            return np.arange(total) - np.repeat(starts, counts)

        for pdf in batches:
            if not len(pdf):
                continue
            lid, x0, y0, x1, y1 = [], [], [], [], []
            vlid, vx, vy = [], [], []
            for row in pdf.itertuples(index=False):
                xs = np.asarray(getattr(row, xs_col), dtype=np.float64)
                ys = np.asarray(getattr(row, ys_col), dtype=np.float64)
                i = np.int64(getattr(row, id_col))
                if xs.shape[0] >= 2:
                    lid.append(np.repeat(i, xs.shape[0] - 1))
                    x0.append(xs[:-1]); y0.append(ys[:-1])
                    x1.append(xs[1:]); y1.append(ys[1:])
                if xs.shape[0] >= 1:
                    # curved sampling needs every line's final vertex;
                    # rect supercover only degenerate single-point rows
                    if not rect or xs.shape[0] == 1:
                        vlid.append(i); vx.append(xs[-1]); vy.append(ys[-1])
            if not vlid and not lid:
                continue
            if not lid:  # single-vertex lines only
                c = cover.encode(cover.wrap_lon(np.asarray(vx)),
                                 np.asarray(vy), res, dggs)
                yield pd.DataFrame({"line_id": np.asarray(vlid, np.int64),
                                    "cell": c}).drop_duplicates(
                                        ignore_index=True)
                continue
            lid = np.concatenate(lid)
            x0 = np.concatenate(x0); y0 = np.concatenate(y0)
            x1 = np.concatenate(x1); y1 = np.concatenate(y1)
            if rect:
                ufun, vfun, nx, ny, make = _axes(cover)
                u0, u1 = ufun(x0), ufun(x1)
                v0, v1 = vfun(y0), vfun(y1)
                du, dv = u1 - u0, v1 - v0
                fu0 = np.floor(np.minimum(u0, u1)).astype(np.int64)
                fu1 = np.floor(np.maximum(u0, u1)).astype(np.int64)
                fv0 = np.floor(np.minimum(v0, v1)).astype(np.int64)
                fv1 = np.floor(np.maximum(v0, v1)).astype(np.int64)
                cu = fu1 - fu0          # crossings of vertical lines
                cv = fv1 - fv0          # crossings of horizontal lines
                if int((cu + cv).max(initial=0)) > 200_000:
                    raise ValueError(
                        "line_cells: a segment crosses >200k cells at "
                        f"res {res}; use a coarser res or split it")
                nseg = lid.shape[0]
                # t of each vertical crossing k = fu0+1 .. fu1
                su = _ragged(cu)
                segu = np.repeat(np.arange(nseg), cu)
                ku = (np.repeat(fu0, cu) + 1 + su).astype(np.float64)
                with np.errstate(divide="ignore", invalid="ignore"):
                    tu = (ku - u0[segu]) / du[segu]
                sv = _ragged(cv)
                segv = np.repeat(np.arange(nseg), cv)
                kv = (np.repeat(fv0, cv) + 1 + sv).astype(np.float64)
                with np.errstate(divide="ignore", invalid="ignore"):
                    tv = (kv - v0[segv]) / dv[segv]
                seg = np.concatenate([np.arange(nseg), np.arange(nseg),
                                      segu, segv])
                t = np.concatenate([np.zeros(nseg), np.ones(nseg), tu, tv])
                o = np.lexsort((t, seg))
                seg, t = seg[o], t[o]
                pair = seg[:-1] == seg[1:]
                tm = 0.5 * (t[:-1] + t[1:])[pair]
                sm = seg[:-1][pair]
                um = u0[sm] + du[sm] * tm
                vm = v0[sm] + dv[sm] * tm
                # lon axis is periodic: unwrapped-frame lines across
                # the antimeridian (F14 semantics) wrap mod nx; the lat
                # axis clips into the edge rows
                ix = np.mod(np.floor(um).astype(np.int64), nx)
                iy = np.clip(np.floor(vm).astype(np.int64), 0, ny - 1)
                olid, ocell = lid[sm], make(ix, iy)
                if vlid:  # degenerate single-point rows in this batch
                    pc = cover.encode(cover.wrap_lon(np.asarray(vx)),
                                      np.asarray(vy), res, dggs)
                    olid = np.concatenate(
                        [olid, np.asarray(vlid, np.int64)])
                    ocell = np.concatenate([ocell, pc])
                out = pd.DataFrame({"line_id": olid, "cell": ocell})
            else:
                dlon = x1 - x0
                dlat = y1 - y0
                p = cover.pitch_deg(res, dggs)
                cmax = np.cos(np.radians(
                    np.minimum(np.abs(y0), np.abs(y1))))
                lx = np.abs(dlon) * cmax / p
                ly = np.abs(dlat) / p
                n = (np.floor(np.maximum(lx, ly) / step_frac)
                     .astype(np.int64) + 1)
                if int(n.max(initial=0)) > 100_000:
                    raise ValueError(
                        "line_cells: a segment needs >100k samples at "
                        f"res {res}; use a coarser res or split it")
                seq = _ragged(n)
                t = seq.astype(np.float64) / np.repeat(n, n)
                slid = np.repeat(lid, n)
                slon = np.repeat(x0, n) + np.repeat(dlon, n) * t
                slat = np.repeat(y0, n) + np.repeat(dlat, n) * t
                slid = np.concatenate([slid, np.asarray(vlid, np.int64)])
                slon = np.concatenate([slon, np.asarray(vx)])
                slat = np.concatenate([slat, np.asarray(vy)])
                c = cover.encode(cover.wrap_lon(slon), slat, res, dggs)
                out = pd.DataFrame({"line_id": slid, "cell": c})
            # a line's spans all live in its own task (one input row),
            # so per-batch dedupe IS the global dedupe — no shuffle
            yield out.drop_duplicates(ignore_index=True)

    return lines.mapInPandas(fn, schema)


def _estimate_cover_rows(polys: DataFrame, res: int, dggs: str) -> int:
    """Cheap UPPER-bound on a polygon cover's row count from polygon
    bboxes alone — the cover ``mapInPandas`` is NOT executed (round-4
    VERDICT #3: the bounded ``limit(n+1).count()`` probe still ran the
    whole unpersisted cover job once before the join recomputed it).

    One scalar agg over the small vector side: cells whose center can
    fall in (or within one cell of) a W×H-degree bbox at pitch ``p``
    number at most ``(W/p + 3)(H/p + 3)`` — ``pitch_deg`` is the
    *smaller* cell dimension, and on angular-pitch grids the lon span
    per cell only widens toward the poles, so bbox/pitch² over-counts;
    ×2 safety for lattice anisotropy.  Over-estimating is the safe
    direction: it only withholds the hint and leaves the join to AQE."""
    from raster2dggs_spark.dggs import cover as _cover

    p = _cover.pitch_deg(res, dggs)
    row = polys.select(
        F.sum(
            ((F.array_max("xs") - F.array_min("xs")) / p + 3.0)
            * ((F.array_max("ys") - F.array_min("ys")) / p + 3.0)
        ).alias("est")
    ).first()
    return 0 if row["est"] is None else int(2.0 * row["est"])


def _gate_broadcast(small: DataFrame, max_rows: int | None,
                    est_rows: int | None = None) -> DataFrame:
    """Attach a broadcast hint only under a size gate.

    With ``est_rows`` (an analytic upper bound, see
    ``_estimate_cover_rows``) the decision costs no Spark job and the
    ``small`` plan executes exactly once — in the join.  Without it,
    ``limit(max_rows + 1).count()`` is a BOUNDED probe: it stops
    producing rows at the limit, so the probe cost stays bounded even
    when the true cover is 10⁷–10⁸ cells (a national zone layer
    polyfilled at res 9) — exactly the case where a forced broadcast
    turns a working shuffled hash join into a driver/executor OOM
    (round-3 VERDICT #3).  Under the gate the hint is provably safe;
    above it the join is left to Catalyst (AQE can still pick a runtime
    broadcast from actual shuffle sizes).  ``max_rows=None`` forces the
    hint — caller asserts the side is tiny."""
    if max_rows is None:
        return F.broadcast(small)
    if est_rows is not None:
        return F.broadcast(small) if est_rows <= max_rows else small
    n = small.limit(max_rows + 1).count()
    return F.broadcast(small) if n <= max_rows else small


def point_in_polygon_join(points: DataFrame, polys: DataFrame, res: int = 7,
                          dggs: str = "hex7", lon_col: str = "lon",
                          lat_col: str = "lat",
                          max_broadcast_cover: int | None = 2_000_000
                          ) -> DataFrame:
    """J5: returns points × containing polygons.

    Plan shape (checked via .explain): the big point side is scanned and
    encoded exactly ONCE; the exploded polygon cover (with vertices
    attached) is broadcast when its analytic bbox/pitch upper bound fits
    under ``max_broadcast_cover`` (else a plain shuffled equi-join — see
    ``_gate_broadcast``/``_estimate_cover_rows``; the cover plan itself
    executes exactly once, in the join); one equi-join on cell; one vectorized
    predicate keeps interior-cell hits outright and ray-casts boundary
    candidates.  No point-side shuffle under the gate, no
    branch-union re-scan."""
    pts = index_points(points, res, dggs, lon_col, lat_col)
    cover = polygon_cells(polys, res, dggs).drop("center_in")
    cover = cover.join(polys.select("poly_id", "xs", "ys"), "poly_id")
    est = (None if max_broadcast_cover is None
           else _estimate_cover_rows(polys, res, dggs))
    joined = pts.join(
        _gate_broadcast(cover, max_broadcast_cover, est_rows=est), "cell")

    @F.pandas_udf(T.BooleanType())
    def keep(pid: pd.Series, lon: pd.Series, lat: pd.Series,
             interior: pd.Series, xs: pd.Series, ys: pd.Series) -> pd.Series:
        out = interior.values.astype(bool).copy()
        todo = np.flatnonzero(~out)
        if todo.size:
            # group boundary rows by poly_id (the true polygon identity —
            # geometry-derived keys can collide) to vectorize the ray cast
            pidv = pid.values[todo]
            order = np.argsort(pidv, kind="stable")
            st = todo[order]
            splits = np.flatnonzero(pidv[order][1:] != pidv[order][:-1]) + 1
            for ii in np.split(st, splits):
                vx = np.asarray(xs.iloc[ii[0]])
                vy = np.asarray(ys.iloc[ii[0]])
                out[ii] = raycast_contains(lon.values[ii], lat.values[ii], vx, vy)
        return pd.Series(out)

    return joined.where(
        keep(F.col("poly_id"), F.col(lon_col), F.col(lat_col),
             F.col("interior"), F.col("xs"), F.col("ys"))
    ).drop("interior", "cell", "xs", "ys")


def parent_expr(cell_col, parent_res: int, dggs: str = "hex7",
                from_res: int | None = None):
    """Native-Column cell→parent (pure bit arithmetic — zero Python).

    H3: set res nibble, fill finer digits with 7 (h3lib.cell_to_parent
    semantics).  S2: (id & -lsb) | lsb.  Geohash: prefix truncation —
    requires ``from_res`` (the cells' uniform precision) since the packed
    id carries its own length."""
    c = F.col(cell_col) if isinstance(cell_col, str) else cell_col
    if dggs == "hex7":
        res_mask = ~(0xF << 52)  # python int; fits int64
        fill = (1 << (3 * (15 - parent_res))) - 1
        return (c.bitwiseAND(F.lit(res_mask))).bitwiseOR(
            F.lit(parent_res << 52)
        ).bitwiseOR(F.lit(fill))
    if dggs == "s2":
        lsb = 1 << (2 * (30 - parent_res))
        return (c.bitwiseAND(F.lit(-lsb))).bitwiseOR(F.lit(lsb))
    if dggs == "geohash":
        if from_res is None:
            raise ValueError("geohash parent_expr needs from_res")
        drop = 5 * (from_res - parent_res)
        bits = F.shiftrightunsigned(c, 4 + drop)
        return F.shiftleft(bits, 4).bitwiseOR(F.lit(parent_res))
    if dggs == "rhp":
        if from_res is None:
            raise ValueError("rhp parent_expr needs from_res")
        prod = 9 ** (from_res - parent_res)
        # 6*9^15 < 2^53 -> double floor-div exact
        bits = F.shiftrightunsigned(c, 4)
        return F.shiftleft(F.floor(bits / F.lit(prod)).cast("long"), 4).bitwiseOR(
            F.lit(parent_res)
        )
    if dggs == "a5":
        # zero the digits finer than parent_res (and the quintant when
        # parent_res is 0), rewrite the 5-bit res field @55 — mirrors
        # a5lib.cell_to_parent exactly
        s = 55 if parent_res == 0 else 52 - 2 * (parent_res - 1)
        mask = (-(1 << s)) & ~(0x1F << 55)
        return (c.bitwiseAND(F.lit(mask))).bitwiseOR(F.lit(parent_res << 55))
    if dggs in ("i4r", "e4r"):
        # per-axis right shift of the 26-bit row/col fields — mirrors
        # i4rlib.cell_to_parent exactly (e4r shares the id layout;
        # needs the cells' uniform res)
        if from_res is None:
            raise ValueError("i4r parent_expr needs from_res")
        sh = from_res - parent_res
        row = F.shiftrightunsigned(c, 26).bitwiseAND(F.lit(0x3FFFFFF))
        col = c.bitwiseAND(F.lit(0x3FFFFFF))
        head = c.bitwiseAND(F.lit(0xF << 57)).bitwiseOR(
            F.lit(parent_res << 52))
        return head.bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(row, sh), 26)
        ).bitwiseOR(F.shiftrightunsigned(col, sh))
    if dggs in ("i9r", "e9r"):
        # per-axis floor-div of the 26-bit row/col fields by 3^k —
        # mirrors i9rlib.cell_to_parent; values < 2^26 so the double
        # floor-div is exact (rhp precedent)
        if from_res is None:
            raise ValueError("i9r parent_expr needs from_res")
        div = 3 ** (from_res - parent_res)
        row = F.shiftrightunsigned(c, 26).bitwiseAND(F.lit(0x3FFFFFF))
        col = c.bitwiseAND(F.lit(0x3FFFFFF))
        head = c.bitwiseAND(F.lit(0xF << 57)).bitwiseOR(
            F.lit(parent_res << 52))
        return head.bitwiseOR(
            F.shiftleft(F.floor(row / F.lit(div)).cast("long"), 26)
        ).bitwiseOR(F.floor(col / F.lit(div)).cast("long"))
    if dggs == "quadkey":
        # drop trailing base-4 digits — mirrors quadkeylib.cell_to_parent
        if from_res is None:
            raise ValueError("quadkey parent_expr needs from_res")
        drop = 2 * (from_res - parent_res)
        bits = F.shiftrightunsigned(c, 5 + drop)
        return F.shiftleft(bits, 5).bitwiseOR(F.lit(parent_res))
    if dggs == "maidenhead":
        if from_res is None:
            raise ValueError("maidenhead parent_expr needs from_res")
        from raster2dggs_spark.dggs.maidenheadlib import BASES

        prod = 1
        for b in BASES[parent_res:from_res]:
            prod *= b * b
        # max packed value (18·10·24·10·24)² < 2^53 → double floor-div exact
        bits = F.shiftrightunsigned(c, 4)
        return F.shiftleft(F.floor(bits / F.lit(prod)).cast("long"), 4).bitwiseOR(
            F.lit(parent_res)
        )
    raise ValueError(dggs)


def _res_for_radius(radius_m: float, dggs: str, fine_res: int) -> int:
    """FINEST res whose cell pitch is still >= radius/8 — keeps disk
    covers at O(100-1000) candidate cells regardless of radius (any
    grid).  One level finer multiplies the ring-sample count ~7x (hex)
    per query per round — measured 8x wall on the kNN bench."""
    from raster2dggs_spark.dggs import cover

    target = np.degrees(radius_m / EARTH_R) / 8.0
    r = 0
    while r < fine_res and cover.pitch_deg(r, dggs) > target:
        r += 1
    if r > 0 and cover.pitch_deg(r, dggs) < target:
        r -= 1
    return r


def estimate_knn_radius(targets: DataFrame, k: int,
                        lon_col: str = "lon", lat_col: str = "lat",
                        margin: float = 3.0) -> float:
    """Density-derived starting radius: if the n targets were uniform over
    their bounding cap, k neighbors live within r = sqrt(k/n · area/π);
    ``margin``× covers clustering.  One cheap aggregate over targets."""
    row = targets.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(lat_col).alias("lat0"), F.max(lat_col).alias("lat1"),
        F.min(lon_col).alias("lon0"), F.max(lon_col).alias("lon1"),
    ).collect()[0]
    n = max(1, row["n"])
    lat_m = (row["lat1"] - row["lat0"]) * 111_195.0
    coslat = max(0.05, float(np.cos(np.radians((row["lat0"] + row["lat1"]) / 2))))
    lon_m = (row["lon1"] - row["lon0"]) * 111_195.0 * coslat
    area = max(lat_m * lon_m, 1.0)
    return margin * float(np.sqrt((k + 1) / n * area / np.pi)) + 1.0



def disk_cover_cells(df: DataFrame, radius: float, cres: int,
                     dggs: str = "hex7", q_id: str = "q_id",
                     lon_col: str = "lon", lat_col: str = "lat"
                     ) -> DataFrame:
    """Explode each query point into the cells (at ``cres``) of its
    geodesic disk of ``radius`` meters — the shared candidate-cell
    generator for kNN and within-distance joins.  Exact integer
    enumeration on fixed-degree grids (geohash/maidenhead); dense
    0.35x-pitch ring sampling elsewhere.  One narrow ``mapInPandas``
    over (id, lon, lat) rows; no shuffle."""
    schema = T.StructType([
        T.StructField(q_id, df.schema[q_id].dataType, False),
        T.StructField("q_lon", T.DoubleType(), False),
        T.StructField("q_lat", T.DoubleType(), False),
        T.StructField("jcell", T.LongType(), False),
    ])
    # the disk-sample pattern (azimuth, angular distance) is shared by
    # every query in a batch -> precompute once per batch, vectorize
    # across the whole batch (one encode for all queries)
    from raster2dggs_spark.dggs import cover as _cover

    ang = radius / EARTH_R
    pitch0 = np.radians(_cover.pitch_deg(cres, dggs)) * 0.35
    # grids whose cells are lon/lat-aligned rectangles get EXACT integer
    # enumeration (quadkey rows through the Mercator fy axis — its cells
    # SHRINK in lat-degrees toward the poles, so equatorial-pitch ring
    # sampling would skip rows there: the lat-distortion bug class)
    fixed_deg_grid = dggs in ("geohash", "maidenhead", "quadkey")

    def disk_pattern(pitch):
        steps = int(np.ceil(ang / pitch)) + 1
        pat_az = [np.array([0.0])]
        pat_rad = [np.array([0.0])]
        for rad in np.linspace(0.0, ang, steps + 1)[1:]:
            kk = max(6, int(np.ceil(2 * np.pi * rad / pitch)))
            pat_az.append(np.linspace(0.0, 2 * np.pi, kk, endpoint=False))
            pat_rad.append(np.full(kk, rad))
        return np.concatenate(pat_az), np.concatenate(pat_rad)

    def _ragged_ranges(lo, hi):
        """Flatten per-row integer ranges [lo_i, hi_i] into
        (row_index, value) arrays."""
        counts = (hi - lo + 1).astype(np.int64)
        total = int(counts.sum())
        idx = np.repeat(np.arange(lo.shape[0]), counts)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        seq = np.arange(total) - np.repeat(starts, counts)
        return idx, np.repeat(lo, counts) + seq

    def fn_fixed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # geohash/maidenhead cells are lon/lat rectangles with FIXED
        # degree spans, so the disk cover is enumerated EXACTLY as
        # integer index ranges per lat band (conservative lon width
        # per band) — an angular sampling pattern would need its
        # pitch shrunk by cos(lat) and blow up near the poles
        from raster2dggs_spark.dggs import cover

        ang_deg = np.degrees(ang)
        if dggs == "quadkey":
            from raster2dggs_spark.dggs import quadkeylib

            nq = 1 << cres
            nlon = nlat = nq
            lonspan = 360.0 / nq

            def row_of_lat(lat):
                phi = np.radians(np.clip(lat, -quadkeylib.MAX_LAT,
                                         quadkeylib.MAX_LAT))
                return (1.0 - np.log(np.tan(phi) + 1.0 / np.cos(phi))
                        / np.pi) / 2.0 * nq

            def lat_of_row(v):
                # edge rows absorb the |lat| > MAX_LAT clip -> extend
                # their band to the pole for the width computation
                out = np.degrees(np.arctan(np.sinh(
                    np.pi * (1.0 - 2.0 * np.asarray(v, np.float64) / nq))))
                out = np.where(np.asarray(v) <= 0, 90.0, out)
                return np.where(np.asarray(v) >= nq, -90.0, out)
        else:
            lonspan, latspan = cover.cell_spans(cres, dggs)
            nlon = int(round(360.0 / lonspan))
            nlat = int(round(180.0 / latspan))

            def row_of_lat(lat):
                return (lat + 90.0) / latspan

            def lat_of_row(v):
                return np.asarray(v, np.float64) * latspan - 90.0
        for pdf in batches:
            if not len(pdf):
                continue
            qlon = pdf[lon_col].values.astype(np.float64)
            qlat = pdf[lat_col].values.astype(np.float64)
            r_a = row_of_lat(qlat - ang_deg)
            r_b = row_of_lat(qlat + ang_deg)
            li0 = np.clip(np.floor(np.minimum(r_a, r_b))
                          .astype(np.int64), 0, nlat - 1)
            li1 = np.clip(np.floor(np.maximum(r_a, r_b))
                          .astype(np.int64), 0, nlat - 1)
            qi_r, row = _ragged_ranges(li0, li1)
            b0 = lat_of_row(row)
            b1 = lat_of_row(row + 1)
            band_lat_lo = np.minimum(b0, b1)
            band_lat_hi = np.maximum(b0, b1)
            # EXACT per-band lon half-width (spherical law of
            # cosines): at latitude phi the disk's boundary sits at
            # dlam = acos((cos a - sin(qlat) sin(phi)) /
            #             (cos(qlat) cos(phi))),
            # with the clip encoding the two degenerate regimes —
            # q >= 1: disk never reaches phi (width 0); q <= -1: the
            # whole parallel lies inside the disk (over-the-pole
            # reach, width 180).  Over an interval of latitudes the
            # max width is attained at an endpoint or at the widest
            # latitude phi* with sin(phi*) = sin(qlat)/cos a (disk
            # tangent to a meridian), so evaluating those <=3
            # candidates is exact.  The former 1.2*a/cos(phi)
            # heuristic undercovered bands adjacent to (but not
            # inside) a pole cap — the known lat-distortion bug
            # class (round-3 ADVICE).
            qlat_b = qlat[qi_r]
            qlat_r = np.radians(qlat_b)
            sin_q, cos_q = np.sin(qlat_r), np.cos(qlat_r)
            cos_a = np.cos(ang)

            def _width_deg(phi_deg):
                phi = np.radians(np.clip(phi_deg, -89.999999, 89.999999))
                q = (cos_a - sin_q * np.sin(phi)) / (
                    np.maximum(cos_q, 1e-12) * np.cos(phi))
                return np.degrees(np.arccos(np.clip(q, -1.0, 1.0)))

            lo_phi = np.maximum(band_lat_lo, qlat_b - ang_deg)
            hi_phi = np.minimum(band_lat_hi, qlat_b + ang_deg)
            dlon = np.maximum(_width_deg(lo_phi), _width_deg(hi_phi))
            if cos_a > 0.0:
                s = sin_q / cos_a
                ok = np.abs(s) <= 1.0
                phi_star = np.degrees(np.arcsin(np.clip(s, -1.0, 1.0)))
                in_band = ok & (phi_star >= lo_phi) & (phi_star <= hi_phi)
                if in_band.any():
                    dlon = np.where(in_band,
                                    np.maximum(dlon, _width_deg(phi_star)),
                                    dlon)
            else:
                # radius >= quarter sphere: cover everything
                dlon = np.full_like(dlon, 180.0)
            # queries at/near a pole: cos(qlat) ~ 0 makes the ratio
            # meaningless — every longitude is within the disk's span
            dlon = np.where(cos_q < 1e-9, 180.0, dlon)
            dlon = np.minimum(180.0, dlon + 1e-7)  # float-safety pad
            ji0 = np.floor((qlon[qi_r] - dlon + 180.0) / lonspan).astype(np.int64)
            ji1 = np.floor((qlon[qi_r] + dlon + 180.0) / lonspan).astype(np.int64)
            ji1 = np.minimum(ji1, ji0 + nlon - 1)  # full wrap at most once
            qi_c, col = _ragged_ranges(ji0, ji1)
            col = np.mod(col, nlon)
            rowc = row[qi_c]
            qidx = qi_r[qi_c]
            lon_c = (col + 0.5) * lonspan - 180.0
            lat_c = lat_of_row(rowc + 0.5)
            cells = cover.encode(lon_c, lat_c, cres, dggs)
            yield pd.DataFrame({
                q_id: pdf[q_id].values[qidx],
                "q_lon": qlon[qidx],
                "q_lat": qlat[qidx],
                "jcell": cells,
            })

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from raster2dggs_spark.dggs import cover, h3lib

        pat_az, pat_rad = disk_pattern(pitch0)
        for pdf in batches:
            if not len(pdf):
                continue
            qids = pdf[q_id].values
            qlon = np.radians(pdf[lon_col].values.astype(np.float64))
            qlat = np.radians(pdf[lat_col].values.astype(np.float64))
            n, p = qlon.shape[0], pat_az.shape[0]
            la, lo = h3lib._geo_az_distance(
                qlat[:, None], qlon[:, None], pat_az[None, :], pat_rad[None, :]
            )
            glon = np.degrees(lo).ravel()
            glat = np.degrees(la).ravel()
            cells = cover.encode(glon, glat, cres, dggs)
            qidx = np.repeat(np.arange(n), p)
            # dedupe (query, cell) pairs: lexsort + consecutive-diff
            order = np.lexsort((cells, qidx))
            qi, ce = qidx[order], cells[order]
            keep = np.ones(qi.shape[0], dtype=bool)
            keep[1:] = (qi[1:] != qi[:-1]) | (ce[1:] != ce[:-1])
            qi, ce = qi[keep], ce[keep]
            yield pd.DataFrame({
                q_id: qids[qi],
                "q_lon": pdf[lon_col].values[qi],
                "q_lat": pdf[lat_col].values[qi],
                "jcell": ce,
            })

    if fixed_deg_grid:
        return df.mapInPandas(fn_fixed, schema)

    return df.mapInPandas(fn, schema)

def knn_join(queries: DataFrame, targets: DataFrame, k: int,
             radius_m: float | None = None, res: int = 9, dggs: str = "hex7",
             q_id: str = "q_id", t_id: str = "t_id",
             lon_col: str = "lon", lat_col: str = "lat",
             max_rounds: int = 4) -> DataFrame:
    """J6 kNN: targets indexed ONCE at fine ``res``; each round covers an
    expanding disk with cells at a radius-adaptive coarser res and joins
    on the *native bitwise parent* of the target cell — no re-indexing,
    no Python in the join key.  Exact haversine top-k per query (Window),
    ties broken by (distance, target id); queries short of k retry at 3×
    radius on the unmatched subset only.

    The candidate-generation semantics match libh3 ``grid_disk`` ring
    expansion (SURVEY.md J6) expressed as radius expansion."""
    if radius_m is None:
        radius_m = estimate_knn_radius(targets, k, lon_col, lat_col)
    # the ring-cover UDF and the per-point encode are the compute-dense
    # stages; a narrow upstream (single parquet file, filtered subset)
    # would single-task them — widen BEFORE the heavy work.  No-op on
    # tables already at cluster parallelism (the 100-TB case), and the
    # shuffle it adds is of slim (id, lon, lat) rows only.
    par = queries.sparkSession.sparkContext.defaultParallelism
    if targets.rdd.getNumPartitions() < par:
        targets = targets.repartition(par)
    t = index_points(targets, res, dggs, lon_col, lat_col).select(
        F.col(t_id), F.col("cell"),
        F.col(lon_col).alias("t_lon"), F.col(lat_col).alias("t_lat"),
    )
    t = t.persist()

    def ring_cells(df: DataFrame, radius: float, cres: int) -> DataFrame:
        return disk_cover_cells(df, radius, cres, dggs, q_id,
                                lon_col, lat_col)

    from raster2dggs_spark.operators.aggregates import top_k

    remaining = queries.select(q_id, lon_col, lat_col)
    if remaining.rdd.getNumPartitions() < par:
        remaining = remaining.repartition(par)
    results = None
    tk = None
    radius = radius_m
    rem_n = None  # count of unresolved queries (drives the round loop)
    for _ in range(max_rounds):
        cres = _res_for_radius(radius, dggs, res)
        tt = t.withColumn("jcell", parent_expr("cell", cres, dggs, from_res=res))
        cand = ring_cells(remaining, radius, cres).join(tt, "jcell")
        dist = 2.0 * EARTH_R * F.asin(F.sqrt(
            F.pow(F.sin(F.radians(F.col("t_lat") - F.col("q_lat")) / 2), 2)
            + F.cos(F.radians("q_lat")) * F.cos(F.radians("t_lat"))
            * F.pow(F.sin(F.radians(F.col("t_lon") - F.col("q_lon")) / 2), 2)
        ))
        cand = cand.withColumn("dist_m", dist).where(F.col("dist_m") <= radius)
        tk = top_k(cand, [q_id], "dist_m", k, ascending=True, tiebreak=[t_id])
        # the round is driver-synced anyway (the loop needs the remaining
        # count) — localCheckpoint the round's top-k so downstream unions
        # don't re-run the candidate join and the per-round inputs can be
        # unpersisted immediately
        tk = tk.select(q_id, t_id, "dist_m", "rank").localCheckpoint(eager=True)
        # a query is resolved when it has a rank-k row (top_k emits dense
        # ranks 1..min(k, hits))
        done_ids = tk.where(F.col("rank") >= k).select(q_id)
        done = tk.join(done_ids, q_id, "left_semi")
        results = done if results is None else results.unionByName(done)
        prev_remaining = remaining
        remaining = remaining.join(done_ids, q_id, "left_anti").persist()
        rem_n = remaining.count()
        prev_remaining.unpersist()  # no-op on the first (unpersisted) round
        if rem_n == 0:
            break
        radius *= 3.0
    else:
        # accept < k neighbors for queries that exhausted the max radius
        leftover = tk.join(remaining.select(q_id), q_id, "left_semi")
        results = results.unionByName(leftover)
    remaining.unpersist()
    t.unpersist()
    return results


def within_distance_join(queries: DataFrame, targets: DataFrame,
                         radius_m: float, res: int = 9, dggs: str = "hex7",
                         q_id: str = "q_id", t_id: str = "t_id",
                         lon_col: str = "lon", lat_col: str = "lat",
                         keep_target_cols: tuple = ()
                         ) -> DataFrame:
    """Geodesic distance-band join: every (query, target) pair within
    ``radius_m`` meters, with the exact haversine distance — the spatial
    range join of the kNN family (ref ``interpolation.py`` neighbor
    gathering generalized to an explicit radius; the buffered-bbox cell
    filter of ``common.py:344-360`` as a first-class join).

    Plan shape (100-TB): targets are indexed ONCE at fine ``res`` and
    joined on the native bitwise parent at a radius-adaptive coarser
    res; queries explode to their disk-cover cells (exact integer
    enumeration on fixed-degree grids, dense ring sampling elsewhere)
    in one narrow ``mapInPandas`` — superset candidates, then one exact
    haversine filter.  ONE shuffle (the equi-join); no window, no
    driver loop.  The cover res keeps candidates at O(cells-in-disk)
    per query regardless of radius, so skew follows data density, not
    radius."""
    par = queries.sparkSession.sparkContext.defaultParallelism
    if targets.rdd.getNumPartitions() < par:
        targets = targets.repartition(par)
    q = queries.select(q_id, lon_col, lat_col)
    if q.rdd.getNumPartitions() < par:
        q = q.repartition(par)
    t = index_points(targets, res, dggs, lon_col, lat_col).select(
        F.col(t_id), F.col("cell"),
        F.col(lon_col).alias("t_lon"), F.col(lat_col).alias("t_lat"),
        *[F.col(c) for c in keep_target_cols],
    )
    cres = _res_for_radius(radius_m, dggs, res)
    # drop the fine target cell once the coarse join key exists — it
    # also frees the "cell" name for q_id (idw_to_cells joins on it)
    tt = t.withColumn("jcell", parent_expr("cell", cres, dggs,
                                           from_res=res)).drop("cell")
    # pad the sampled disk by one cover-cell pitch: a target just inside
    # the radius can sit in a cell whose disk overlap is a thin sliver —
    # the superset is free (exact filter below), the miss would not be
    from raster2dggs_spark.dggs import cover as _cover

    pad_m = np.radians(_cover.pitch_deg(cres, dggs)) * EARTH_R
    cand = disk_cover_cells(q, radius_m + pad_m, cres, dggs, q_id,
                            lon_col, lat_col).join(tt, "jcell")
    dist = 2.0 * EARTH_R * F.asin(F.sqrt(
        F.pow(F.sin(F.radians(F.col("t_lat") - F.col("q_lat")) / 2), 2)
        + F.cos(F.radians("q_lat")) * F.cos(F.radians("t_lat"))
        * F.pow(F.sin(F.radians(F.col("t_lon") - F.col("q_lon")) / 2), 2)
    ))
    return (cand.withColumn("dist_m", dist)
            .where(F.col("dist_m") <= F.lit(float(radius_m)))
            .select(q_id, t_id, "dist_m", *keep_target_cols))


def idw_to_cells(points: DataFrame, cells_df: DataFrame, radius_m: float,
                 res: int = 9, dggs: str = "hex7",
                 value_col: str = "v", cell_col: str = "cell",
                 t_id: str = "t_id", lon_col: str = "lon",
                 lat_col: str = "lat", power: float = 2.0) -> DataFrame:
    """Inverse-distance-weighted gridding: interpolate scattered point
    values onto the centers of a cell layer — the station-data →
    gridded-raster step (Shepard 1968; the ungridded twin of the
    reference's cell-center sampling kernels, `interpolation.py`).

    Per target cell: idw = sum(v / d^p) / sum(1 / d^p) over the points
    within ``radius_m`` of the cell center (d floored at 1 mm so an
    exact center hit cannot divide by zero), plus ``n_contrib``.

    Scale shape: the within-distance join's plan — targets indexed once
    at fine ``res``, cell centers explode to disk-cover candidate cells,
    ONE equi-join + exact haversine filter, then ONE groupBy(cell) with
    map-side partial sums.  No windows, no cross joins; cost scales
    with actual (cell, point) proximity pairs, not |cells| x |points|."""
    from raster2dggs_spark.dggs import cover as _cover

    schema = T.StructType(
        [cells_df.schema[cell_col],
         T.StructField(lon_col, T.DoubleType(), False),
         T.StructField(lat_col, T.DoubleType(), False)])

    def ctr(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            lon, lat = _cover.cell_center(pdf[cell_col].values, dggs)
            yield pd.DataFrame({cell_col: pdf[cell_col].values,
                                lon_col: lon, lat_col: lat})

    centers = cells_df.select(cell_col).mapInPandas(ctr, schema)
    wd = within_distance_join(
        centers, points, radius_m, res=res, dggs=dggs, q_id=cell_col,
        t_id=t_id, lon_col=lon_col, lat_col=lat_col,
        keep_target_cols=(value_col,))
    w = 1.0 / F.pow(F.greatest(F.col("dist_m"), F.lit(1e-3)),
                    F.lit(float(power)))
    return (wd.groupBy(cell_col)
            .agg(F.sum(w * F.col(value_col)).alias("wv"),
                 F.sum(w).alias("w"),
                 F.count(F.lit(1)).alias("n_contrib"))
            .select(cell_col,
                    (F.col("wv") / F.col("w")).alias("idw"),
                    F.col("n_contrib").cast("long").alias("n_contrib")))


KDE_KERNELS = ("quartic", "epanechnikov", "triangular")


def kde_to_cells(points: DataFrame, cells_df: DataFrame,
                 bandwidth_m: float, res: int = 9, dggs: str = "hex7",
                 kernel: str = "quartic", value_col: str | None = None,
                 cell_col: str = "cell", t_id: str = "t_id",
                 lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Kernel density estimation of a point set onto cell centers —
    the heatmap / hot-route surface (GRASS ``v.kernel``, QGIS Heatmap,
    ArcGIS Kernel Density).  Per target cell center x:
    ``density = C_K / h^2 * sum_i w_i * K(d(x, p_i) / h)`` over points
    within one bandwidth ``h``, with the compact kernels

    - quartic (biweight):  K(u) = (1 - u^2)^2,  C_K = 3/pi
    - epanechnikov:        K(u) = 1 - u^2,      C_K = 2/pi
    - triangular:          K(u) = 1 - u,        C_K = 3/pi

    so the density integrates to Σw over the plane (per m²; multiply by
    cell_area_m2 for per-cell mass).  ``value_col`` weights each point
    (population-weighted heat); omitted = unweighted counts.

    Scale shape: identical to :func:`idw_to_cells` — the within-
    distance join (disk-cover candidates at a radius-adaptive coarse
    res + ONE equi-join + exact haversine, never |cells| x |points|)
    then ONE groupBy(cell) of map-side partial sums.  The kernels are
    compact (zero beyond h), so cost scales with true proximity pairs.
    """
    if kernel not in KDE_KERNELS:
        raise ValueError(f"kernel {KDE_KERNELS}, got {kernel!r}")
    from raster2dggs_spark.dggs import cover as _cover

    schema = T.StructType(
        [cells_df.schema[cell_col],
         T.StructField(lon_col, T.DoubleType(), False),
         T.StructField(lat_col, T.DoubleType(), False)])

    def ctr(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            lon, lat = _cover.cell_center(pdf[cell_col].values, dggs)
            yield pd.DataFrame({cell_col: pdf[cell_col].values,
                                lon_col: lon, lat_col: lat})

    centers = cells_df.select(cell_col).mapInPandas(ctr, schema)
    keep = (value_col,) if value_col is not None else ()
    wd = within_distance_join(
        centers, points, bandwidth_m, res=res, dggs=dggs, q_id=cell_col,
        t_id=t_id, lon_col=lon_col, lat_col=lat_col,
        keep_target_cols=keep).where(
            F.col("dist_m") < F.lit(float(bandwidth_m)))
    h = float(bandwidth_m)
    u = F.col("dist_m") / F.lit(h)
    if kernel == "quartic":
        kv, ck = (1.0 - u * u) * (1.0 - u * u), 3.0
    elif kernel == "epanechnikov":
        kv, ck = 1.0 - u * u, 2.0
    else:
        kv, ck = 1.0 - u, 3.0
    import math
    norm = ck / (math.pi * h * h)
    w = kv * F.col(value_col) if value_col is not None else kv
    return (wd.groupBy(cell_col)
            .agg(F.sum(w).alias("kw"),
                 F.count(F.lit(1)).alias("n_contrib"))
            .select(cell_col,
                    (F.col("kw") * F.lit(norm)).alias("density"),
                    F.col("n_contrib").cast("long").alias("n_contrib")))


def empirical_variogram(points: DataFrame, value_col: str,
                        max_dist_m: float, n_bins: int = 10,
                        res: int = 9, dggs: str = "hex7",
                        t_id: str = "t_id", lon_col: str = "lon",
                        lat_col: str = "lat") -> DataFrame:
    """Empirical semivariogram of a point field (Matheron estimator):
    per distance bin of width ``max_dist_m / n_bins``,
    ``gamma = avg(0.5 * (v_i - v_j)^2)`` over the point pairs whose
    great-circle separation falls in the bin — the structure-function
    diagnostic that precedes kriging.  ``n_pairs`` counts ORDERED
    pairs (each unordered pair twice; gamma is unchanged, the count is
    symmetric).

    Scale shape: the pair enumeration is the within-distance join
    (disk-cover candidates + one equi-join + exact haversine — never
    the |P|^2 cross join), then ONE groupBy(bin) over ``n_bins`` rows
    of map-side partials."""
    q = points.select(F.col(t_id).alias("__vq_id"),
                      F.col(lon_col), F.col(lat_col))
    wd = within_distance_join(
        q, points, max_dist_m, res=res, dggs=dggs, q_id="__vq_id",
        t_id=t_id, lon_col=lon_col, lat_col=lat_col,
        keep_target_cols=(value_col,))
    qv = points.select(F.col(t_id).alias("__vq_id"),
                       F.col(value_col).alias("__vq"))
    width = float(max_dist_m) / n_bins
    j = (wd.join(qv, "__vq_id")
         .where((F.col("__vq_id") != F.col(t_id))
                & (F.col("dist_m") < F.lit(float(max_dist_m)))))
    diff = F.col(value_col) - F.col("__vq")
    b = F.floor(F.col("dist_m") / F.lit(width)).cast("long")
    return (j.groupBy(b.alias("bin"))
            .agg(F.avg(0.5 * (diff * diff)).alias("gamma"),
                 F.count(F.lit(1)).alias("n_pairs"))
            .select("bin",
                    (F.col("bin") * F.lit(width)).alias("bin_lo"),
                    ((F.col("bin") + 1) * F.lit(width)).alias("bin_hi"),
                    "gamma",
                    F.col("n_pairs").cast("long").alias("n_pairs")))


def zonal_join(cells_df: DataFrame, zones: DataFrame, res: int,
               agg_exprs: list, dggs: str = "hex7",
               zone_id: str = "poly_id",
               max_broadcast_cover: int | None = 2_000_000) -> DataFrame:
    """J7: zone polygons → cover cells → equi-join with any cell-keyed
    table → per-zone aggregation.  Interior cells join directly; boundary
    membership here is cell-center-based (zonal semantics over the index,
    matching the reference's cell-granularity overlay joins).  The cover
    is broadcast only under the bounded size probe (``_gate_broadcast``);
    above it the equi-join shuffles — correct at any zone-layer size."""
    cover = polygon_cells(zones, res, dggs).where("center_in").select(
        F.col("poly_id").alias(zone_id), "cell"
    )
    est = (None if max_broadcast_cover is None
           else _estimate_cover_rows(zones, res, dggs))
    joined = cells_df.join(
        _gate_broadcast(cover, max_broadcast_cover, est_rows=est), "cell")
    return joined.groupBy(zone_id).agg(*agg_exprs)


def polygon_overlay_area(polys_a: DataFrame, polys_b: DataFrame,
                         res: int, dggs: str = "quadkey",
                         id_a: str = "a_id", id_b: str = "b_id",
                         ) -> DataFrame:
    """Vector-vector polygon overlay THROUGH the cell lattice — the
    DGGS thesis applied to the classic GIS intersect: both layers are
    exactly center-in rasterized (:func:`polygon_fill_cells`), one
    cell equi-join finds every overlapping pair, and per-pair cell
    counts give discrete intersection measures::

        n_shared, frac_a = n/|A|, frac_b = n/|B|,
        jaccard = n / (|A| + |B| - n)      (all fractions 6dp)

    No geometry library, no sweep-line, no candidate bbox pass: the
    lattice IS the spatial index, the join key, and the measure.  At
    scale each layer rasterizes embarrassingly parallel (a polygon
    never leaves its task), the cell join shuffles O(covered cells),
    and per-polygon totals are one groupBy each — contrast a pairwise
    geometric intersect, which needs an R-tree broadcast or an
    all-pairs filter.  Counts are CELL counts (exact under the
    center-in contract; multiply by per-cell areas downstream for m^2
    at latitude-varying grids).  Pairs with no shared cell are absent
    (inner-join semantics).
    """
    a = (polygon_fill_cells(
            polys_a.select(F.col(id_a).alias("poly_id"), "xs", "ys"),
            res, dggs)
         .select(F.col("poly_id").alias(id_a), "cell"))
    b = (polygon_fill_cells(
            polys_b.select(F.col(id_b).alias("poly_id"), "xs", "ys"),
            res, dggs)
         .select(F.col("poly_id").alias(id_b), "cell"))
    inter = (a.join(b, "cell")
             .groupBy(id_a, id_b)
             .agg(F.count(F.lit(1)).alias("n_shared")))
    na = a.groupBy(id_a).agg(F.count(F.lit(1)).alias("n_a"))
    nb = b.groupBy(id_b).agg(F.count(F.lit(1)).alias("n_b"))
    return (inter.join(na, id_a).join(nb, id_b)
            .select(id_a, id_b,
                    F.col("n_shared").cast("long").alias("n_shared"),
                    F.col("n_a").cast("long").alias("n_a"),
                    F.col("n_b").cast("long").alias("n_b"),
                    F.round(F.col("n_shared") / F.col("n_a"), 6)
                    .alias("frac_a"),
                    F.round(F.col("n_shared") / F.col("n_b"), 6)
                    .alias("frac_b"),
                    F.round(F.col("n_shared")
                            / (F.col("n_a") + F.col("n_b")
                               - F.col("n_shared")), 6)
                    .alias("jaccard")))


def explode_segments(lines: DataFrame, id_col: str = "line_id",
                     xs_col: str = "xs", ys_col: str = "ys") -> DataFrame:
    """Polylines -> one row per segment ``(line_id, seg_idx, ax, ay,
    bx, by)`` — pure column expressions (posexplode over a transform),
    no UDF, no shuffle.  Lines with fewer than 2 vertices vanish."""
    segs = F.expr(
        f"transform(sequence(0, size({xs_col}) - 2), j -> "
        f"struct({xs_col}[j] AS ax, {ys_col}[j] AS ay, "
        f"{xs_col}[j + 1] AS bx, {ys_col}[j + 1] AS by))")
    return (lines.where(F.expr(f"size({xs_col}) >= 2"))
            .select(F.col(id_col), F.posexplode(segs)
                    .alias("seg_idx", "seg"))
            .select(id_col, F.col("seg_idx").cast("long").alias("seg_idx"),
                    "seg.ax", "seg.ay", "seg.bx", "seg.by"))


MAX_SEGS_PER_LINE = 1 << 20


def check_packed_seg_ids(segs: DataFrame, line_id: str, op: str) -> None:
    """Validate the packed-segment-key contract shared by
    snap_to_segments and line_intersections: ``line_id *
    MAX_SEGS_PER_LINE + seg_idx`` decodes with truncating div/%, which
    is only injective for non-negative line ids and fewer than
    ``MAX_SEGS_PER_LINE`` segments per line (a negative id silently
    decodes to the WRONG line; an oversized line collides keys across
    lines).  One bounded scalar agg over the exploded segments."""
    b = segs.agg(F.min(F.col(line_id)).alias("lo"),
                 F.max("seg_idx").alias("hi")).collect()[0]
    if b["lo"] is not None and int(b["lo"]) < 0:
        raise ValueError(f"{op}: negative line ids break "
                         "the packed segment key — reindex to >= 0")
    if b["hi"] is not None and int(b["hi"]) >= MAX_SEGS_PER_LINE:
        raise ValueError(
            f"{op}: a line has > {MAX_SEGS_PER_LINE} "
            "segments — split it or raise MAX_SEGS_PER_LINE")


def snap_to_segments(points: DataFrame, lines: DataFrame, radius_m: float,
                     dggs: str = "quadkey",
                     point_id: str = "point_id", line_id: str = "line_id",
                     lon_col: str = "lon", lat_col: str = "lat",
                     xs_col: str = "xs", ys_col: str = "ys") -> DataFrame:
    """Map matching: snap each point to its nearest polyline segment
    within ``radius_m`` — the GPS-trace / road-network join (GRASS
    ``v.distance``, PostGIS ``ST_ClosestPoint`` per nearest line, the
    snap step of every map-matching pipeline).  The reference carries
    no vector-vector machinery at all (raster in, cells out); this is
    the natural lattice-blocked formulation of the gap.

    Distance metric (pinned; mirrored exactly by the SQL oracle): the
    local equirectangular frame centred on the point — lon deltas are
    wrapped into ±180°, scaled by ``cos(point_lat)``, both axes by
    metres-per-degree on the authalic sphere — then the classic
    clamped-projection point-to-segment distance.  Planar map-matching
    semantics, standard at snapping radii (<~1% vs geodesic at
    |lat| <= 80 for 300 km); NOT a geodesic (the blocking pad below
    absorbs the discrepancy, so no true neighbour is lost).

    Winner per point: lexicographic min of ``(round(dist_m, 4),
    line_id, seg_idx)`` — a TOTAL order (the repo's tie-break rule;
    adjacent segments sharing the snap vertex tie in rounded distance
    and resolve by id, identically in Spark and DuckDB).

    Plan shape (100-TB): segments explode column-natively and are
    supercovered ONCE at a radius-adaptive coarse res (exact crossing
    enumeration on rectangle grids via :func:`line_cells`); points
    explode to padded disk covers at the same res; ONE cell equi-join
    makes candidates, one seg-geometry equi-join (AQE-broadcast when
    small) attaches coordinates, one groupBy(point) takes the min —
    no window over a global key, no all-pairs, cost follows true
    point/line proximity.  The disk pad is ANALYTIC: one scalar
    aggregate reads max|lat|, and the cover radius is inflated by the
    worst-case equirect-vs-geodesic scale ratio cos(phi)/cos(phi+dr)
    plus one cover-cell pitch, so the candidate set provably contains
    every pair whose FINAL metric is within ``radius_m``.
    """
    from raster2dggs_spark.dggs import cover as _cover

    m_deg = float(np.radians(1.0) * EARTH_R)
    # analytic blocking margin (see docstring); one bounded scalar agg
    row = points.agg(F.max(F.abs(F.col(lat_col))).alias("m")).collect()[0]
    phi = float(row["m"] or 0.0)
    dr = radius_m / m_deg
    if phi + dr > 89.5:
        # the equirect metric (and its cover-inflation bound)
        # degenerates when the snap disk reaches the pole — refuse
        # rather than silently miss true neighbours (code-review
        # finding; the repo's lat-distortion bug class)
        raise ValueError(
            f"snap_to_segments: points reach |lat| {phi:.2f} with a "
            f"{dr:.2f} deg radius — within 0.5 deg of the pole the "
            "local-equirectangular metric is not valid; reduce the "
            "radius or reproject polar points")
    margin = np.cos(np.radians(phi)) / np.cos(np.radians(phi + dr))
    # one level coarser than the kNN family's radius/8 pitch: segments
    # are EXTENDED objects, so candidate-pair count is ~invariant in
    # cres while the point-side disk enumeration shrinks 4x — measured
    # 23% faster on the 50k-point bench with identical output
    cres = _res_for_radius(2.0 * radius_m, dggs, 30)
    pad_m = np.radians(_cover.pitch_deg(cres, dggs)) * EARTH_R
    cover_r = radius_m * float(max(1.0, margin)) + pad_m

    segs = explode_segments(lines, line_id, xs_col, ys_col)
    check_packed_seg_ids(segs, line_id, "snap_to_segments")
    seg_geom = segs.select(
        (F.col(line_id) * MAX_SEGS_PER_LINE + F.col("seg_idx"))
        .alias("seg_id"), "ax", "ay", "bx", "by")
    seg_lines = segs.select(
        (F.col(line_id) * MAX_SEGS_PER_LINE + F.col("seg_idx"))
        .alias("line_id"),
        F.array("ax", "bx").alias("xs"), F.array("ay", "by").alias("ys"))
    seg_cells = (line_cells(seg_lines, cres, dggs)
                 .select(F.col("line_id").alias("seg_id"),
                         F.col("cell").alias("jcell")))

    q = points.select(F.col(point_id).alias("q_id"), lon_col, lat_col)
    cand = (disk_cover_cells(q, cover_r, cres, dggs, "q_id",
                             lon_col, lat_col)
            .join(seg_cells, "jcell")
            .join(seg_geom, "seg_id")
            # the ONLY libm call stays a JVM expression (bit-identical
            # to the previous all-expression form and to the DuckDB
            # oracle parity that form established)
            .select("q_id", "q_lon", "q_lat", "seg_id",
                    "ax", "ay", "bx", "by",
                    (F.cos(F.radians("q_lat")) * F.lit(m_deg))
                    .alias("__k")))

    # Candidate scoring runs as ONE vectorized Arrow pass (guide §4.2)
    # instead of column expressions: expressed relationally, Catalyst
    # re-inlines the clamped-projection t at every reference (filter
    # pushdown substitutes straight through any staging projections,
    # deterministic or not), producing a ~5 KB interpreted predicate
    # inside the candidate join — measured 121 s task CPU for the
    # scoring alone on the 50k-point bench vs ~2 s vectorized.  Every
    # numpy op below is IEEE-exact and mirrors the former expressions:
    # fmod == Java %, sqrt is correctly rounded, fmin/fmax skip NaN
    # exactly like Spark least/greatest — outputs are bit-identical.
    #
    # wrap endpoint A into ±180° of the point, then keep B CONTINUOUS
    # with A (wrap the A->B lon step, not B itself): independently
    # wrapped endpoints flip sign across the antimeridian and turn a
    # short far-side segment into a fictitious ~33,000 km chord
    # passing near the origin (found by the snap_points oracle)
    from typing import Iterator as _Iterator

    score_schema = T.StructType([
        cand.schema["q_id"],
        T.StructField("seg_id", T.LongType(), False),
        T.StructField("t_frac", T.DoubleType(), True),
        T.StructField("dist_m", T.DoubleType(), True),
        T.StructField("snap_lon", T.DoubleType(), True),
        T.StructField("snap_lat", T.DoubleType(), True),
    ])
    rad = float(radius_m)
    _m = float(m_deg)

    def _score(batches: _Iterator[pd.DataFrame]) -> _Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            qlon = pdf["q_lon"].to_numpy(np.float64)
            qlat = pdf["q_lat"].to_numpy(np.float64)
            k = pdf["__k"].to_numpy(np.float64)
            ax = pdf["ax"].to_numpy(np.float64)
            ay = pdf["ay"].to_numpy(np.float64)
            bx = pdf["bx"].to_numpy(np.float64)
            by = pdf["by"].to_numpy(np.float64)
            axm = (np.fmod(ax - qlon + 540.0, 360.0) - 180.0) * k
            aym = (ay - qlat) * _m
            vx = (np.fmod(bx - ax + 540.0, 360.0) - 180.0) * k
            vy = (by - qlat) * _m - aym
            l2 = vx * vx + vy * vy
            with np.errstate(divide="ignore", invalid="ignore"):
                traw = -(axm * vx + aym * vy) / l2
            t = np.where(l2 > 0.0,
                         np.fmax(0.0, np.fmin(1.0, traw)), 0.0)
            cx = axm + t * vx
            cy = aym + t * vy
            dist = np.sqrt(cx * cx + cy * cy)
            keep = dist <= rad
            if not keep.any():
                continue
            yield pd.DataFrame({
                "q_id": pdf["q_id"].values[keep],
                "seg_id": pdf["seg_id"].values[keep],
                "t_frac": t[keep],
                "dist_m": dist[keep],
                "snap_lon": qlon[keep] + cx[keep] / k[keep],
                "snap_lat": qlat[keep] + cy[keep] / _m,
            })

    scored = cand.mapInPandas(_score, score_schema)
    # duplicate (point, seg) candidates from shared cover cells are
    # ABSORBED by the lexicographic min — no dedupe shuffle needed
    best = (scored.groupBy("q_id").agg(F.min(F.struct(
        F.round("dist_m", 4).alias("dist_m"),
        F.expr(f"seg_id div {MAX_SEGS_PER_LINE}").alias(line_id),
        (F.col("seg_id") % MAX_SEGS_PER_LINE).alias("seg_idx"),
        F.round("t_frac", 6).alias("t_frac"),
        F.round("snap_lon", 6).alias("snap_lon"),
        F.round("snap_lat", 6).alias("snap_lat"))).alias("b")))
    return best.select(
        F.col("q_id").alias(point_id),
        F.col("b.dist_m").alias("dist_m"),
        F.col("b." + line_id).alias(line_id),
        F.col("b.seg_idx").alias("seg_idx"),
        F.col("b.t_frac").alias("t_frac"),
        F.col("b.snap_lon").alias("snap_lon"),
        F.col("b.snap_lat").alias("snap_lat"))


def buffer_cells(points: DataFrame, radius_m: float, res: int,
                 dggs: str = "hex7", point_id: str = "point_id",
                 lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Distance buffer rasterized to the grid (GRASS ``v.buffer`` +
    ``v.to.rast`` / ``ST_Buffer`` then zonal use): every cell at
    ``res`` whose CENTER lies within ``radius_m`` meters (haversine)
    of at least one input point, with the distance to the nearest
    point and the contributing-point count.

    Center-in semantics are exact and engine-reproducible (unlike an
    intersects-buffer contract, whose rim slivers depend on polygon
    densification); the disk-cover enumeration only needs to be a
    SUPERSET — one cover-cell pitch of padding guarantees no center
    within the radius is missed.

    Scale shape (100-TB): one narrow ``mapInPandas`` explodes points
    to padded disk-cover candidate cells (exact integer enumeration on
    fixed-degree grids), a second computes centers + haversine
    vectorized, ONE groupBy(cell) folds min-distance and count.  Cost
    follows buffered area x point density; no point-point or
    cell-cell joins.
    """
    from raster2dggs_spark.dggs import cover as _cover

    pad_m = np.radians(_cover.pitch_deg(res, dggs)) * EARTH_R
    q = points.select(F.col(point_id).alias("q_id"), lon_col, lat_col)
    cand = disk_cover_cells(q, radius_m + pad_m, res, dggs, "q_id",
                            lon_col, lat_col)
    schema = T.StructType([
        T.StructField("cell", T.LongType(), False),
        T.StructField("dist_m", T.DoubleType(), False)])

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            clon, clat = _cover.cell_center(pdf["jcell"].values, dggs)
            qlon = pdf["q_lon"].values
            qlat = pdf["q_lat"].values
            d = 2.0 * EARTH_R * np.arcsin(np.sqrt(
                np.sin(np.radians(clat - qlat) / 2.0) ** 2
                + np.cos(np.radians(qlat)) * np.cos(np.radians(clat))
                * np.sin(np.radians(clon - qlon) / 2.0) ** 2))
            keep = d <= radius_m
            if keep.any():
                yield pd.DataFrame({
                    "cell": pdf["jcell"].values[keep],
                    "dist_m": d[keep]})

    scored = cand.mapInPandas(fn, schema)
    return (scored.groupBy("cell")
            .agg(F.min("dist_m").alias("dist_m"),
                 F.count(F.lit(1)).alias("n_contrib"))
            .select("cell", F.round("dist_m", 4).alias("dist_m"),
                    F.col("n_contrib").cast("long").alias("n_contrib")))
