"""Affine pixel<->CRS math, vectorized NumPy.

Semantics mirror the reference's pixel handling:
- pixel-*centre* registration: CRS coord of pixel (row, col) centre is
  ``affine * (col + 0.5, row + 0.5)`` (reference builds coordinate grids the
  same way — /root/reference/raster2dggs/indexers/rasterindexer.py:181-188,
  and uses the -0.5 correction for fractional pixel coords in
  /root/reference/raster2dggs/interpolation.py:145-152);
- row-major ravel: ``grid_x = tile(xs, h)``, ``grid_y = repeat(ys, w)`` so a
  flattened ``(bands, h, w)`` array lines up 1:1 with the coord columns.

An affine is the 6-tuple ``(a, b, c, d, e, f)``:
    x = a*col + b*row + c
    y = d*col + e*row + f
(North-up rasters have b = d = 0 and e < 0.)
"""

from __future__ import annotations

import numpy as np

from raster2dggs_spark.geo.crs import mercator_to_lonlat, to_lonlat


def apply_affine(affine, cols: np.ndarray, rows: np.ndarray):
    """(col, row) -> (x, y). Fractional pixel coords allowed."""
    a, b, c, d, e, f = affine
    x = a * cols + b * rows + c
    y = d * cols + e * rows + f
    return x, y


def invert_affine(affine):
    """Return the inverse 6-tuple mapping (x, y) -> (col, row)."""
    a, b, c, d, e, f = affine
    det = a * e - b * d
    if det == 0:
        raise ValueError("singular affine")
    ia, ib = e / det, -b / det
    id_, ie = -d / det, a / det
    ic = -(ia * c + ib * f)
    if_ = -(id_ * c + ie * f)
    return (ia, ib, ic, id_, ie, if_)


def pixel_centers_lonlat(affine, w: int, h: int, crs: str):
    """lon/lat (degrees, WGS84) of every pixel centre, row-major flattened.

    Returns (lon, lat) float64 arrays of length w*h. ``crs`` is
    ``"EPSG:4326"`` (affine already yields degrees), ``"EPSG:3857"``
    (Web-Mercator meters) or any TM-family code ``geo.crs.to_lonlat``
    knows (UTM 326xx/327xx, NZTM 2193, Chatham 3793).
    """
    cols = np.tile(np.arange(w, dtype=np.float64) + 0.5, h)
    rows = np.repeat(np.arange(h, dtype=np.float64) + 0.5, w)
    x, y = apply_affine(affine, cols, rows)
    return to_lonlat(x, y, crs)
