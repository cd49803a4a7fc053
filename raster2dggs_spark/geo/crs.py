"""Closed-form CRS transforms + geodesic areas (no pyproj offline).

The reference delegates to pyproj (/root/reference/raster2dggs/common.py:
803-813) and pyproj.Geod for areas (/root/reference/raster2dggs/common.py:
49-64, overlay.py:182-199).  We standardize the synthetic image table on
EPSG:4326 and EPSG:3857 and implement those transforms plus an authalic
per-latitude-band area formula in NumPy.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6378137.0  # WGS84 semi-major (spherical Mercator radius)
# authalic sphere radius — good to <0.2% for band areas vs full geodesic
EARTH_AUTHALIC_RADIUS_M = 6371007.1809


def lonlat_to_mercator(lon, lat):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = EARTH_RADIUS_M * np.radians(lon)
    y = EARTH_RADIUS_M * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def mercator_to_lonlat(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / EARTH_RADIUS_M)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / EARTH_RADIUS_M)) - np.pi / 2.0)
    return lon, lat


def haversine_m(lon1, lat1, lon2, lat2, radius: float = EARTH_AUTHALIC_RADIUS_M):
    """Great-circle distance in meters, vectorized, degrees in."""
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(v, dtype=np.float64))
                              for v in (lon1, lat1, lon2, lat2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * radius * np.arcsin(np.minimum(1.0, np.sqrt(a)))


def geodesic_band_area_m2(lat_top_deg, lat_bot_deg, dlon_deg,
                          radius: float = EARTH_AUTHALIC_RADIUS_M):
    """Area of a lon/lat-aligned trapezoid band: R^2 * dλ * |sinφ1 - sinφ2|.

    This is the reference's per-row geodesic weights-raster idea
    (/root/reference/raster2dggs/indexers/overlay.py:182-199) in authalic
    closed form.
    """
    lat_top = np.radians(np.asarray(lat_top_deg, dtype=np.float64))
    lat_bot = np.radians(np.asarray(lat_bot_deg, dtype=np.float64))
    dlon = np.radians(np.asarray(dlon_deg, dtype=np.float64))
    return radius * radius * np.abs(dlon) * np.abs(np.sin(lat_top) - np.sin(lat_bot))


def geodesic_row_areas_m2(affine, w: int, h: int, crs: str):
    """Per-pixel geodesic area, one value per row (north-up rasters),
    returned as a length-h array (constant across a row).

    Projected (3857) pixels get an area corrected by cos(lat) of the row
    centre (Mercator area distortion 1/cos²φ, times the nominal |a*e|
    gives true ≈ |a*e|·cos²φ... we instead convert edges to lat and use the
    exact band formula).  Geographic (4326): exact trapezoid band.
    """
    a, b, c, d, e, f = affine
    rows = np.arange(h, dtype=np.float64)
    if crs == "EPSG:4326":
        lat_top = f + e * rows
        lat_bot = f + e * (rows + 1.0)
        return geodesic_band_area_m2(lat_top, lat_bot, abs(a))
    if crs == "EPSG:3857":
        y_top = f + e * rows
        y_bot = f + e * (rows + 1.0)
        _, lat_top = mercator_to_lonlat(np.zeros_like(y_top), y_top)
        _, lat_bot = mercator_to_lonlat(np.zeros_like(y_bot), y_bot)
        dlon_deg = np.degrees(abs(a) / EARTH_RADIUS_M)
        return geodesic_band_area_m2(lat_top, lat_bot, dlon_deg)
    raise ValueError(f"unsupported crs {crs!r}")
