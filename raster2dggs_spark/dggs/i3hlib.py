"""``i3h`` — an ISEA3H-LAYOUT aperture-3 hexagonal grid.

The reference's 3H grids (ISEA3H / IVEA3H / RTEA3H via DGGAL,
ref dggalrasterindexer.py) have refinement ratio 3: each level's hex
lattice is √3× finer and rotated 30° from the previous, so children do
NOT nest — a vertex child is shared by THREE parents.  That topology is
what the reference's multi-parent compaction (A17,
dggalrasterindexer.py:236-372) exists for, and it is inexpressible on
the nested grids (hex7/s2/geohash/rhp).

This module provides the honest offline analogue, in the same spirit as
``hex7`` (h3lib): the published aperture-3 STRUCTURE on this repo's
icosahedral gnomonic faces, with an OWN id scheme —
NOT dggal-interoperable (dggal zone ids derive from native library
tables not recallable offline; the grid key is ``i3h`` and nothing
pretends otherwise).

Layout
------
- Faces: the 20 icosahedron faces shared with h3lib (face centers/axes
  derived geometrically at import).
- Per face, res r is a hex lattice in the face's gnomonic plane with
  center spacing 3^(−r/2) res-0 units, rotated 30° on odd r (Class
  I/II alternation — the ISEA3H signature).
- A point encodes to the NEAREST face's lattice (encoder-partition
  semantics at face seams, like hex7); all hierarchy math
  (parents/children) happens within the cell's own face frame, so the
  hierarchy is deterministic and total.  Seam caveat: a parent whose
  vertex child falls on the neighbouring face never sees 7 children —
  multi-parent compaction is simply conservative there.

Id: int64 — face:5 bits @59 | res:5 @54 | (a+2^26):27 @27 | (b+2^26):27
(a, b axial lattice coords; good to res 29).

Hierarchy (exact lattice arithmetic, no search):
- a child center lies either ON a parent lattice point (center child,
  ONE parent) or on a parent hex VERTEX (vertex child, THREE parents —
  the 3 hexes sharing that vertex);
- a parent has 7 children: its center child + its 6 vertices (each
  shared 3 ways — the fractional-children multiplicity A17 respects).
"""

from __future__ import annotations

import numpy as np

from raster2dggs_spark.dggs.h3lib import (
    _FACE_AXES_AZ,
    _FACE_CENTER_GEO,
    _FACE_CENTER_XYZ,
    _FACE_COS_LAT,
    _FACE_COS_LON,
    _FACE_SIN_LAT,
    _FACE_SIN_LON,
    _geo_az_distance,
    _hex2d_to_axial,
    _axial_to_hex2d,
    RES0_U_GNOMONIC,
)

MAX_RES = 29
SQRT3 = np.sqrt(3.0)
# "no parent" sentinel: valid ids occupy the full int64 range (face >= 16
# sets the sign bit), so -1 would collide — INT64_MIN is unreachable
# (it would need face=16, res=0, a=b=-2^26; lattice coords are bounded
# far inside the 27-bit fields)
NO_PARENT = np.int64(np.iinfo(np.int64).min)
_M = 1 << 26
_NEIGH = np.array(
    [(1, 0), (1, 1), (0, 1), (-1, 0), (-1, -1), (0, -1)], dtype=np.int64
)
_ENCODE_CHUNK = 8192


def _phi(res: int) -> float:
    """Basis rotation of level ``res``: 30° on odd levels."""
    return (np.pi / 6.0) if (res % 2) else 0.0


def _rot(x, y, ang: float):
    c, s = np.cos(ang), np.sin(ang)
    return c * x - s * y, c * y + s * x


def pack(face, res: int, a, b):
    face = np.asarray(face, dtype=np.int64)
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    if np.any((a < -_M) | (a >= _M) | (b < -_M) | (b >= _M)):
        raise ValueError("i3h lattice coords out of the 27-bit field")
    return (
        (face << 59) | (np.int64(res) << 54) | ((a + _M) << 27) | (b + _M)
    ).astype(np.int64)


def unpack(cells):
    c = np.asarray(cells, dtype=np.int64).ravel()
    u = c.astype(np.uint64)
    face = ((u >> np.uint64(59)) & np.uint64(0x1F)).astype(np.int64)
    res = ((u >> np.uint64(54)) & np.uint64(0x1F)).astype(np.int64)
    a = ((u >> np.uint64(27)) & np.uint64(0x7FFFFFF)).astype(np.int64) - _M
    b = (u & np.uint64(0x7FFFFFF)).astype(np.int64) - _M
    return face, res, a, b


def get_resolution(cells):
    return unpack(cells)[1]


def _face_plane(lon_deg, lat_deg):
    """(face, x0, y0): nearest face + gnomonic plane coords in res-0
    units, θ measured from the face axis (the h3lib forward core)."""
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64).ravel())
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64).ravel())
    n = lon.shape[0]
    sin_lat, cos_lat = np.sin(lat), np.cos(lat)
    sin_lon, cos_lon = np.sin(lon), np.cos(lon)
    xyz = np.column_stack([cos_lat * cos_lon, cos_lat * sin_lon, sin_lat])
    dots = xyz @ _FACE_CENTER_XYZ.T
    face = np.argmax(dots, axis=1).astype(np.int64)
    c = np.clip(dots[np.arange(n), face], 1e-12, 1.0)
    cos_dlon = cos_lon * _FACE_COS_LON[face] + sin_lon * _FACE_SIN_LON[face]
    sin_dlon = sin_lon * _FACE_COS_LON[face] - cos_lon * _FACE_SIN_LON[face]
    N = cos_lat * sin_dlon
    D = _FACE_COS_LAT[face] * sin_lat - _FACE_SIN_LAT[face] * cos_lat * cos_dlon
    sin_c = np.sqrt(np.maximum(N * N + D * D, 1e-300))
    cos_az, sin_az = D / sin_c, N / sin_c
    # θ = A − az
    A = _FACE_AXES_AZ[face, 0]
    cA, sA = np.cos(A), np.sin(A)
    cos_t = cA * cos_az + sA * sin_az
    sin_t = sA * cos_az - cA * sin_az
    rp = (sin_c / c) / RES0_U_GNOMONIC
    return face, rp * cos_t, rp * sin_t


def lonlat_to_cell(lon_deg, lat_deg, res: int):
    if not 0 <= res <= MAX_RES:
        raise ValueError("res out of range")
    lon_a = np.asarray(lon_deg, dtype=np.float64).ravel()
    lat_a = np.asarray(lat_deg, dtype=np.float64).ravel()
    out = np.empty(lon_a.shape[0], dtype=np.int64)
    for i in range(0, max(lon_a.shape[0], 1), _ENCODE_CHUNK):
        sl = slice(i, i + _ENCODE_CHUNK)
        face, x0, y0 = _face_plane(lon_a[sl], lat_a[sl])
        s = SQRT3 ** res
        xr, yr = _rot(x0, y0, -_phi(res))
        a, b = _hex2d_to_axial(xr * s, yr * s)
        out[sl] = pack(face, res, a, b)
    return out


def cell_to_latlng(cells):
    face, res, a, b = unpack(cells)
    xr, yr = _axial_to_hex2d(a, b)
    out_lon = np.empty(face.shape[0], dtype=np.float64)
    out_lat = np.empty(face.shape[0], dtype=np.float64)
    for r in np.unique(res):
        m = res == r
        s = SQRT3 ** int(r)
        x0, y0 = _rot(xr[m] / s, yr[m] / s, _phi(int(r)))
        r2d = np.hypot(x0, y0)
        rang = np.arctan(r2d * RES0_U_GNOMONIC)
        az = _FACE_AXES_AZ[face[m], 0] - np.arctan2(y0, x0)
        lat0 = _FACE_CENTER_GEO[face[m], 0]
        lon0 = _FACE_CENTER_GEO[face[m], 1]
        lat, lon = _geo_az_distance(lat0, lon0, az, rang)
        ctr = r2d < 1e-12
        lat = np.where(ctr, lat0, lat)
        lon = np.where(ctr, lon0, lon)
        out_lon[m] = np.degrees(lon)
        out_lat[m] = np.degrees(lat)
    out_lon = (out_lon + 180.0) % 360.0 - 180.0
    return out_lon, out_lat


def _to_parent_frame(res: int, a, b):
    """Child axial (res) → parent-frame plane coords (res−1 units)."""
    xr, yr = _axial_to_hex2d(a, b)
    d = _phi(res) - _phi(res - 1)
    return _rot(xr / SQRT3, yr / SQRT3, d)


def cell_to_parents(cells):
    """(n, 3) parent ids at res−1; center children carry their single
    parent in column 0 with columns 1-2 = NO_PARENT.  Vertex children:
    the 3 hexes sharing the vertex the child center sits on."""
    face, res, a, b = unpack(cells)
    n = face.shape[0]
    out = np.full((n, 3), NO_PARENT, dtype=np.int64)
    for r in np.unique(res):
        if r < 1:
            raise ValueError("res-0 cells have no parent")
        m = np.flatnonzero(res == r)
        qx, qy = _to_parent_frame(int(r), a[m], b[m])
        g0a, g0b = _hex2d_to_axial(qx, qy)
        cand_a = g0a[:, None] + np.concatenate(
            [[np.int64(0)], _NEIGH[:, 0]]
        )[None, :]
        cand_b = g0b[:, None] + np.concatenate(
            [[np.int64(0)], _NEIGH[:, 1]]
        )[None, :]
        cx, cy = _axial_to_hex2d(cand_a.ravel(), cand_b.ravel())
        d = np.hypot(
            cx.reshape(-1, 7) - qx[:, None], cy.reshape(-1, 7) - qy[:, None]
        )
        center = d[:, 0] < 1e-9
        # vertex: exactly the candidates at circumradius 1/sqrt(3)
        near = d <= (1.0 / SQRT3 + 1e-9)
        # fully vectorized (round-4 ADVICE: this runs inside the A17
        # edge UDF on every level — a per-row pack() loop made the
        # hottest compaction path O(n) interpreted Python)
        ctr = np.flatnonzero(center)
        if ctr.size:
            out[m[ctr], 0] = pack(face[m[ctr]], int(r) - 1,
                                  g0a[ctr], g0b[ctr])
        vtx = np.flatnonzero(~center)
        if vtx.size:
            nearv = near[vtx]
            bad = nearv.sum(axis=1) != 3
            if bad.any():  # numerically defensive: force exactly 3 near
                sel3 = np.argsort(d[vtx[bad]], axis=1)[:, :3]
                fixed = np.zeros((int(bad.sum()), d.shape[1]), dtype=bool)
                np.put_along_axis(fixed, sel3, True, axis=1)
                nearv = nearv.copy()
                nearv[bad] = fixed
            # np.nonzero is row-major → per-row candidate-index order is
            # preserved (same parent column order as the scalar loop)
            sel = np.nonzero(nearv)[1].reshape(-1, 3)
            out[m[vtx]] = pack(
                np.repeat(face[m[vtx]], 3), int(r) - 1,
                np.take_along_axis(cand_a[vtx], sel, axis=1).ravel(),
                np.take_along_axis(cand_b[vtx], sel, axis=1).ravel(),
            ).reshape(-1, 3)
    return out


def cell_to_children(cells):
    """(n, 7) children ids at res+1: column 0 the center child, columns
    1-6 the six vertex children (each shared with 2 neighbour parents)."""
    face, res, a, b = unpack(cells)
    n = face.shape[0]
    out = np.empty((n, 7), dtype=np.int64)
    # hexagon vertices in its own frame: distance 1/sqrt(3), angles 30°+k60°
    vang = np.radians(30.0 + 60.0 * np.arange(6))
    vx = np.cos(vang) / SQRT3
    vy = np.sin(vang) / SQRT3
    if res.size and int(res.max()) >= MAX_RES:
        raise ValueError("children would exceed MAX_RES")
    for r in np.unique(res):
        m = np.flatnonzero(res == r)
        xr, yr = _axial_to_hex2d(a[m], b[m])
        px = np.concatenate([xr[:, None], xr[:, None] + vx[None, :]], axis=1)
        py = np.concatenate([yr[:, None], yr[:, None] + vy[None, :]], axis=1)
        d = _phi(int(r) + 1) - _phi(int(r))
        cxr, cyr = _rot(px.ravel() * SQRT3, py.ravel() * SQRT3, -d)
        ca, cb = _hex2d_to_axial(cxr, cyr)
        out[m] = pack(
            np.repeat(face[m], 7), int(r) + 1, ca, cb
        ).reshape(-1, 7)
    return out


def cell_pitch_rad(res: int) -> float:
    """Approx angular distance between adjacent cell centers at res."""
    return float(np.arctan(RES0_U_GNOMONIC) / SQRT3 ** res)


def cell_to_lonlat(cells):
    """Registry alias (cover.cell_center contract)."""
    return cell_to_latlng(cells)


def cell_to_parent(cells, parent_res: int):
    """CENTROID-parent chain: at each step the parent is the res−1 hex
    CONTAINING the child's center (hex rounding) — the deterministic
    single-parent selection a multi-parent grid needs for partitioning
    columns (dggal's getZoneCentroidParent notion).  The full
    multi-parent set is ``cell_to_parents``; A17 uses that."""
    face, res, a, b = unpack(cells)
    if np.any(parent_res > res):
        raise ValueError("parent_res coarser than cell res required")
    out = np.empty(face.shape[0], dtype=np.int64)
    for r in np.unique(res):
        m = res == r
        ca, cb = a[m], b[m]
        for step in range(int(r), parent_res, -1):
            qx, qy = _to_parent_frame(step, ca, cb)
            ca, cb = _hex2d_to_axial(qx, qy)
        out[m] = pack(face[m], parent_res, ca, cb)
    return out


def _plane_to_geo(face, x0, y0):
    """res-0 face-plane coords → (lon_deg, lat_deg): the spherical leg
    of ``cell_to_latlng`` for arbitrary plane points (boundaries)."""
    r2d = np.hypot(x0, y0)
    rang = np.arctan(r2d * RES0_U_GNOMONIC)
    az = _FACE_AXES_AZ[face, 0] - np.arctan2(y0, x0)
    lat0 = _FACE_CENTER_GEO[face, 0]
    lon0 = _FACE_CENTER_GEO[face, 1]
    lat, lon = _geo_az_distance(lat0, lon0, az, rang)
    ctr = r2d < 1e-12
    lat = np.where(ctr, lat0, lat)
    lon = np.where(ctr, lon0, lon)
    lon = np.degrees(lon)
    return (lon + 180.0) % 360.0 - 180.0, np.degrees(lat)


def cell_to_boundary(cells):
    """(vlon, vlat) of shape (n, 6): the hexagon's vertices (CCW in the
    cell's lattice frame) decoded through the face's gnomonic inverse."""
    face, res, a, b = unpack(cells)
    xr, yr = _axial_to_hex2d(a, b)
    vang = np.radians(30.0 + 60.0 * np.arange(6))
    vx = np.cos(vang) / SQRT3
    vy = np.sin(vang) / SQRT3
    out_lon = np.empty((face.shape[0], 6), dtype=np.float64)
    out_lat = np.empty((face.shape[0], 6), dtype=np.float64)
    for r in np.unique(res):
        m = res == r
        s = SQRT3 ** int(r)
        px = xr[m][:, None] + vx[None, :]
        py = yr[m][:, None] + vy[None, :]
        x0, y0 = _rot(px / s, py / s, _phi(int(r)))
        lon, lat = _plane_to_geo(face[m][:, None], x0, y0)
        out_lon[m] = lon
        out_lat[m] = lat
    return out_lon, out_lat


def cell_area_m2(cells, radius_m: float = 6371007.1809):
    """Per-cell spherical area from the hexagon boundary via the
    spherical trapezoid (Green's theorem) formula — the h3lib F7
    approach on this lattice's 6-vertex rings."""
    vlon, vlat = cell_to_boundary(cells)
    lam = np.radians(vlon)
    phi = np.radians(vlat)
    lam = lam - 2 * np.pi * np.round((lam - lam[:, :1]) / (2 * np.pi))
    lam2 = np.roll(lam, -1, axis=1)
    phi2 = np.roll(phi, -1, axis=1)
    s = np.sum((lam2 - lam) * (np.sin(phi) + np.sin(phi2)), axis=1)
    return 0.5 * radius_m * radius_m * np.abs(s)
