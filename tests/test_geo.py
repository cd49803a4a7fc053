"""geo: affine / CRS transforms / geodesic areas.

Mirrors the reference's analytic-golden-value strategy
(/root/reference/tests/classes/test_output_schema.py:940-1050 uses exact
geodesic areas; test_pixel_registration.py:50-74 pins pixel-centre
registration)."""

import numpy as np
import pytest

from raster2dggs_spark.geo import (
    pixel_centers_lonlat,
    apply_affine,
    invert_affine,
    lonlat_to_mercator,
    mercator_to_lonlat,
    haversine_m,
    geodesic_row_areas_m2,
)
from raster2dggs_spark.geo.crs import geodesic_band_area_m2, EARTH_AUTHALIC_RADIUS_M


def test_affine_pixel_center_registration():
    # 10x10 raster over [0,1]x[0,1] degrees, north-up
    aff = (0.1, 0.0, 0.0, 0.0, -0.1, 1.0)
    lon, lat = pixel_centers_lonlat(aff, 10, 10, "EPSG:4326")
    assert lon.shape == (100,)
    # first pixel centre at (0.05, 0.95); row-major ravel
    assert lon[0] == pytest.approx(0.05)
    assert lat[0] == pytest.approx(0.95)
    assert lon[1] == pytest.approx(0.15)  # next col
    assert lat[10] == pytest.approx(0.85)  # next row
    assert lon[-1] == pytest.approx(0.95)
    assert lat[-1] == pytest.approx(0.05)


def test_affine_inverse_roundtrip():
    aff = (0.25, 0.0, 12.0, 0.0, -0.5, 47.0)
    inv = invert_affine(aff)
    cols = np.array([0.0, 3.7, 9.2])
    rows = np.array([0.0, 1.1, 8.8])
    x, y = apply_affine(aff, cols, rows)
    c2, r2 = apply_affine(inv, x, y)
    np.testing.assert_allclose(c2, cols, atol=1e-12)
    np.testing.assert_allclose(r2, rows, atol=1e-12)


def test_mercator_roundtrip_and_known_values():
    lon = np.array([0.0, 10.0, -120.0, 179.0])
    lat = np.array([0.0, 45.0, -60.0, 80.0])
    x, y = lonlat_to_mercator(lon, lat)
    # known: lon 0 -> x 0; equator -> y 0
    assert x[0] == 0.0 and y[0] == 0.0
    lon2, lat2 = mercator_to_lonlat(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_haversine_known_value():
    # one degree of longitude at the equator ≈ 111.195 km (authalic radius)
    d = haversine_m(np.array([0.0]), np.array([0.0]), np.array([1.0]), np.array([0.0]))
    assert d[0] == pytest.approx(np.radians(1.0) * EARTH_AUTHALIC_RADIUS_M, rel=1e-9)


def test_geodesic_band_area_conservation():
    # sum of all 1-degree bands over the sphere = 4 pi R^2
    lats = np.arange(90, -90, -1.0)
    areas = geodesic_band_area_m2(lats, lats - 1.0, 360.0)
    total = float(np.sum(areas))
    assert total == pytest.approx(4 * np.pi * EARTH_AUTHALIC_RADIUS_M**2, rel=1e-12)


def test_row_areas_4326_vs_3857_consistent():
    # same geographic strip expressed in both CRS: areas must agree ~exactly
    aff4326 = (0.01, 0.0, 5.0, 0.0, -0.01, 46.0)
    a1 = geodesic_row_areas_m2(aff4326, 10, 10, "EPSG:4326")
    from raster2dggs_spark.geo import lonlat_to_mercator as fwd

    x0, y0 = fwd(np.array([5.0]), np.array([46.0]))
    x1, y1 = fwd(np.array([5.01]), np.array([45.99]))
    # build a mercator affine with varying row height ≈ only approximately
    # constant; compare just the top row using exact edge latitudes
    affm = (float(x1[0] - x0[0]), 0.0, float(x0[0]), 0.0, float(y1[0] - y0[0]), float(y0[0]))
    a2 = geodesic_row_areas_m2(affm, 10, 10, "EPSG:3857")
    assert a2[0] == pytest.approx(a1[0], rel=1e-6)
