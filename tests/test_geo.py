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


# ----------------------------------------------------------------------
# Transverse Mercator (Krüger series) — round 6


def test_tm_roundtrip_identity():
    """forward∘inverse identity to <1e-11 degrees across the zone."""
    from raster2dggs_spark.geo.crs import tm_for_epsg

    tm = tm_for_epsg(32618)  # UTM 18N
    rng = np.random.default_rng(0)
    lon = rng.uniform(-80, -70, 2000)
    lat = rng.uniform(-84, 84, 2000)
    x, y = tm.forward(lon, lat)
    lon2, lat2 = tm.inverse(x, y)
    assert np.abs(lon2 - lon).max() < 1e-11
    assert np.abs(lat2 - lat).max() < 1e-11


def test_tm_central_meridian_equals_meridian_arc_quadrature():
    """On the central meridian, northing = k0 * meridian arc — checked
    against direct numerical integration of the arc integrand (an
    independent formulation: no Krüger series involved)."""
    from raster2dggs_spark.geo.crs import tm_for_epsg

    tm = tm_for_epsg(32618)
    a, f = 6378137.0, 1 / 298.257223563
    e2 = f * (2 - f)
    trap = getattr(np, "trapezoid", None) or np.trapz
    for phi in (10.0, 45.0, 80.0):
        t = np.linspace(0.0, np.radians(phi), 200001)
        m = a * trap((1 - e2) / (1 - e2 * np.sin(t) ** 2) ** 1.5, t)
        _, y = tm.forward(np.array([-75.0]), np.array([phi]))
        assert abs(y[0] - 0.9996 * m) < 1e-5  # sub-0.01 mm


def test_tm_matches_independent_redfearn_series():
    """Cross-check against the classic Redfearn/Thomas λ-power expansion
    (a completely different series construction) — agreement <1 mm
    within ±3° of the central meridian."""
    from raster2dggs_spark.geo.crs import tm_for_epsg

    a, f = 6378137.0, 1 / 298.257223563
    e2 = f * (2 - f)

    def redfearn(lon, lat, lon0=-75.0, k0=0.9996, x0=500000.0):
        phi = np.radians(lat)
        lam = np.radians(lon - lon0)
        ep2 = e2 / (1 - e2)
        N = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
        T = np.tan(phi) ** 2
        C = ep2 * np.cos(phi) ** 2
        A = lam * np.cos(phi)
        M = a * ((1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * phi
                 - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024)
                 * np.sin(2 * phi)
                 + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * np.sin(4 * phi)
                 - (35 * e2**3 / 3072) * np.sin(6 * phi))
        x = x0 + k0 * N * (A + (1 - T + C) * A**3 / 6
                           + (5 - 18 * T + T**2 + 72 * C - 58 * ep2)
                           * A**5 / 120)
        y = k0 * (M + N * np.tan(phi) * (
            A**2 / 2 + (5 - T + 9 * C + 4 * C**2) * A**4 / 24
            + (61 - 58 * T + T**2 + 600 * C - 330 * ep2) * A**6 / 720))
        return x, y

    tm = tm_for_epsg(32618)
    rng = np.random.default_rng(7)
    lon = rng.uniform(-78, -72, 500)
    lat = rng.uniform(-80, 80, 500)
    x1, y1 = tm.forward(lon, lat)
    x2, y2 = redfearn(lon, lat)
    assert np.abs(x1 - x2).max() < 1e-3
    assert np.abs(y1 - y2).max() < 1e-3


def test_chatham_3793_se_island_footprint():
    """The reference raster's tiepoint inverse-projects onto Rangatira
    (South East Island, Chatham Islands) — pins the EPSG:3793 parameter
    set (lon0 -176.5, k0 1, FE 3.5e6, FN 1e7 on GRS80)."""
    from raster2dggs_spark.geo.crs import tm_for_epsg

    tm = tm_for_epsg(3793)
    lon, lat = tm.inverse(np.array([3525064.2629]), np.array([5088845.3042]))
    assert abs(lon[0] - -176.18573) < 1e-4
    assert abs(lat[0] - -44.33555) < 1e-4


def test_utm_south_false_northing():
    from raster2dggs_spark.geo.crs import tm_for_epsg

    tm = tm_for_epsg(32719)  # UTM 19S (lon0 -69)
    x, y = tm.forward(np.array([-69.0]), np.array([-33.0]))
    assert abs(x[0] - 500000.0) < 1e-6
    assert 0 < y[0] < 10_000_000.0  # southern hemisphere stays positive
    lon, lat = tm.inverse(x, y)
    assert abs(lat[0] + 33.0) < 1e-11


def test_row_areas_tm_close_to_nominal():
    """TM row areas via the generic corner-shoelace branch ≈ nominal
    |a·e| within the module's documented authalic-sphere accuracy
    (<0.3%; the TM scale distortion k²-1 itself is ~1e-5 here)."""
    from raster2dggs_spark.geo.crs import geodesic_row_areas_m2

    affine = (8.084197628459057, 0.0, 3525064.2629,
              0.0, -8.000545945946707, 5088845.3042)
    areas = geodesic_row_areas_m2(affine, 253, 296, "EPSG:3793")
    nominal = 8.084197628459057 * 8.000545945946707
    assert areas.shape == (296,)
    assert np.abs(areas / nominal - 1.0).max() < 3e-3
    # and the variation ALONG the raster is tiny (constant-k regime)
    assert (areas.max() - areas.min()) / nominal < 1e-5
