"""Pure-NumPy geohash library — exact published geohash system.

Replaces the reference's ``geohash`` backend
(/root/reference/raster2dggs/indexers/geohashrasterindexer.py): base-32
Z-order bisection of (lon, lat), precision 1..12 characters.

Int64 packing (engine-internal; strings at the output edge):

    id = (bits << 4) | precision        bits = 5*precision interleaved
                                        bits, left-aligned at bit 5p-1..0

so parent = drop characters = shift right 5*k then adjust the precision
nibble — pure bit arithmetic, expressible as a native Spark Column like
H3/S2 parents.  Known-vector pinned: geohash(57.64911N, 10.40744E, 11)
== "u4pruydqqvj" (the canonical example).
"""

from __future__ import annotations

import numpy as np

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_B32_INV = {c: i for i, c in enumerate(_B32)}
MAX_PRECISION = 12


def lonlat_to_cell(lon_deg, lat_deg, precision: int):
    """Vectorized encode to packed int64 geohash ids."""
    if not 1 <= precision <= MAX_PRECISION:
        raise ValueError("precision 1..12")
    lon = np.asarray(lon_deg, dtype=np.float64).ravel()
    lat = np.asarray(lat_deg, dtype=np.float64).ravel()
    nbits = 5 * precision
    nlon = (nbits + 1) // 2  # lon gets the first (even) bit positions
    nlat = nbits // 2
    # quantized fractions
    fx = np.clip((lon + 180.0) / 360.0, 0.0, np.nextafter(1.0, 0.0))
    fy = np.clip((lat + 90.0) / 180.0, 0.0, np.nextafter(1.0, 0.0))
    ix = (fx * (1 << nlon)).astype(np.uint64)
    iy = (fy * (1 << nlat)).astype(np.uint64)
    # interleave: bit k of the hash (from the MSB, k=0..nbits-1) is a lon
    # bit for even k, lat bit for odd k.  Magic-mask spread
    # (dggs/_bits.py) replaces the former per-bit loop bit-identically:
    # for even nbits lon bit m (from the LSB) lands at 2m+1, for odd
    # nbits at 2m (and lat at the complementary parity).
    from raster2dggs_spark.dggs._bits import spread

    sx, sy = spread(ix), spread(iy)
    if nbits % 2 == 0:
        bits = (sx << np.uint64(1)) | sy
    else:
        bits = sx | (sy << np.uint64(1))
    return ((bits << np.uint64(4)) | np.uint64(precision)).astype(np.int64)


def cell_from_indices(ix, iy, precision: int):
    """Pack integer (lon, lat) quantizer indices straight into ids —
    the same interleave as :func:`lonlat_to_cell` minus the float
    quantization (exact-supercover constructor)."""
    if not 1 <= precision <= MAX_PRECISION:
        raise ValueError("precision 1..12")
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    from raster2dggs_spark.dggs._bits import spread

    ix = np.asarray(ix, dtype=np.uint64).ravel()
    iy = np.asarray(iy, dtype=np.uint64).ravel()
    sx, sy = spread(ix), spread(iy)
    # same parity rule as lonlat_to_cell (bit-identical to the loop)
    if nbits % 2 == 0:
        bits = (sx << np.uint64(1)) | sy
    else:
        bits = sx | (sy << np.uint64(1))
    return ((bits << np.uint64(4)) | np.uint64(precision)).astype(np.int64)


def get_precision(cells):
    c = np.asarray(cells).astype(np.uint64)
    return (c & np.uint64(0xF)).astype(np.int64)


def cell_to_parent(cells, parent_precision: int):
    """Drop trailing characters — prefix truncation exactly as the
    reference does (geohashrasterindexer.py:58-65)."""
    c = np.asarray(cells).astype(np.uint64)
    p = get_precision(c)
    if np.any(np.int64(parent_precision) > p):
        raise ValueError("parent_precision coarser than cell precision required")
    shift = (np.uint64(5) * (p.astype(np.uint64) - np.uint64(parent_precision)))
    bits = (c >> np.uint64(4)) >> shift
    return ((bits << np.uint64(4)) | np.uint64(parent_precision)).astype(np.int64)


def cell_to_lonlat(cells):
    """Bbox-center lon/lat of packed geohash ids (vectorized)."""
    c = np.asarray(cells).astype(np.uint64).ravel()
    p = get_precision(c)
    out_lon = np.empty(c.shape[0])
    out_lat = np.empty(c.shape[0])
    for prec in np.unique(p):
        m = p == prec
        nbits = int(5 * prec)
        nlon = (nbits + 1) // 2
        nlat = nbits // 2
        from raster2dggs_spark.dggs._bits import compress

        bits = (c[m] >> np.uint64(4)).astype(np.uint64)
        # inverse of the encode parity rule (magic-mask compress)
        if nbits % 2 == 0:
            ix = compress(bits >> np.uint64(1))
            iy = compress(bits)
        else:
            ix = compress(bits)
            iy = compress(bits >> np.uint64(1))
        out_lon[m] = (ix.astype(np.float64) + 0.5) / (1 << nlon) * 360.0 - 180.0
        out_lat[m] = (iy.astype(np.float64) + 0.5) / (1 << nlat) * 180.0 - 90.0
    return out_lon, out_lat


def cells_to_string(cells):
    """Packed ids -> canonical geohash strings."""
    c = np.asarray(cells).astype(np.uint64).ravel()
    out = []
    for v in c:
        prec = int(v & np.uint64(0xF))
        bits = int(v >> np.uint64(4))
        s = []
        for i in range(prec):
            s.append(_B32[(bits >> (5 * (prec - 1 - i))) & 0x1F])
        out.append("".join(s))
    return out


def strings_to_cells(strs):
    out = np.empty(len(strs), dtype=np.int64)
    for i, s in enumerate(strs):
        bits = 0
        for ch in s:
            bits = (bits << 5) | _B32_INV[ch]
        v = ((bits << 4) | len(s)) & 0xFFFFFFFFFFFFFFFF
        out[i] = v - (1 << 64) if v >= (1 << 63) else v
    return out


def cell_pitch_deg(precision: int) -> float:
    """Approx cell height in degrees (lat extent)."""
    nlat = (5 * precision) // 2
    return 180.0 / (1 << nlat)


def cell_area_m2(cells, radius_m: float = 6371007.1809):
    """EXACT per-cell spherical areas: geohash cells are lon/lat
    rectangles, so area = R² · Δλ · (sin φ_top − sin φ_bottom) —
    closed form, per each cell's own packed precision."""
    from raster2dggs_spark.dggs import cover

    c = np.asarray(cells, dtype=np.int64)
    lon, lat = cell_to_lonlat(c)
    p = get_precision(c)
    out = np.empty(c.shape[0], dtype=np.float64)
    for pr in np.unique(p):
        m = p == pr
        w, h = cover.cell_spans(int(pr), "geohash")
        top = np.radians(np.minimum(lat[m] + h / 2.0, 90.0))
        bot = np.radians(np.maximum(lat[m] - h / 2.0, -90.0))
        out[m] = np.radians(w) * (np.sin(top) - np.sin(bot))
    return out * radius_m * radius_m
