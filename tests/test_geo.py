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


# ----------------------------------------------------------------------
# Polar stereographic (round 6)


def test_ps_roundtrip_all_registered():
    from raster2dggs_spark.geo.crs import ps_for_epsg

    for code, latrange in ((3413, (55, 89.9)), (3031, (-89.9, -58)),
                           (3976, (-89.9, -58)), (5041, (60, 89.9)),
                           (5042, (-89.9, -60))):
        ps = ps_for_epsg(code)
        rng = np.random.default_rng(code)
        lon = rng.uniform(-180, 180, 3000)
        lat = rng.uniform(*latrange, 3000)
        x, y = ps.forward(lon, lat)
        lon2, lat2 = ps.inverse(x, y)
        dlon = np.abs((lon2 - lon + 180) % 360 - 180)
        assert dlon.max() < 1e-11 and np.abs(lat2 - lat).max() < 1e-11


def test_ps_conformal_and_unit_scale_at_lat_ts():
    """Independent checks of the projection equations: the numeric
    Jacobian is isotropic (conformality) and the scale factor is
    exactly 1 at the standard parallel (the variant-B definition)."""
    import math

    from raster2dggs_spark.geo.crs import ps_for_epsg

    ps = ps_for_epsg(3413)
    a, e2 = 6378137.0, 0.0066943799901413165
    h = 1e-6
    for lat0, lon0 in ((75.0, 30.0), (62.0, -120.0), (88.0, 5.0)):
        x0, y0 = ps.forward(np.array([lon0]), np.array([lat0]))
        xl, yl = ps.forward(np.array([lon0 + h]), np.array([lat0]))
        xp, yp = ps.forward(np.array([lon0]), np.array([lat0 + h]))
        N = a / math.sqrt(1 - e2 * math.sin(math.radians(lat0)) ** 2)
        M = a * (1 - e2) / (1 - e2 * math.sin(math.radians(lat0)) ** 2) ** 1.5
        ku = np.hypot(xl - x0, yl - y0)[0] / (
            math.radians(h) * N * math.cos(math.radians(lat0)))
        kv = np.hypot(xp - x0, yp - y0)[0] / (math.radians(h) * M)
        assert abs(ku / kv - 1.0) < 1e-7, lat0
    # k == 1 at lat_ts = 70
    x0, y0 = ps.forward(np.array([0.0]), np.array([70.0]))
    xp, yp = ps.forward(np.array([0.0]), np.array([70.0 + h]))
    M70 = a * (1 - e2) / (1 - e2 * math.sin(math.radians(70)) ** 2) ** 1.5
    assert abs(np.hypot(xp - x0, yp - y0)[0] / (math.radians(h) * M70)
               - 1.0) < 1e-6


def test_ps_spherical_limit_closed_form():
    from raster2dggs_spark.geo.crs import PolarStereographic

    ps = PolarStereographic(0.0, True, k0=0.994, f=0.0)
    lat, lon = np.array([70.0]), np.array([45.0])
    x, y = ps.forward(lon, lat)
    rho_cf = 2 * 6378137.0 * 0.994 * np.tan(np.pi / 4 - np.radians(70) / 2)
    assert abs(np.hypot(x, y)[0] - rho_cf) < 1e-9


def test_ps_ups_known_relationships():
    """UPS (5041): the pole maps to (2e6, 2e6); due-north along lon0
    decreases northing; southern twin mirrors."""
    from raster2dggs_spark.geo.crs import ps_for_epsg

    ups = ps_for_epsg(5041)
    x, y = ups.forward(np.array([0.0]), np.array([90.0]))
    assert abs(x[0] - 2e6) < 1e-6 and abs(y[0] - 2e6) < 1e-6
    x, y = ups.forward(np.array([0.0]), np.array([80.0]))
    assert abs(x[0] - 2e6) < 1e-6 and y[0] < 2e6
    ups_s = ps_for_epsg(5042)
    x, y = ups_s.forward(np.array([0.0]), np.array([-80.0]))
    assert abs(x[0] - 2e6) < 1e-6 and y[0] > 2e6


def test_row_areas_ps_close_to_nominal():
    """Generic corner-shoelace row areas on a polar-stereographic
    raster: area = nominal/k² with k the local scale — at lat 70
    (lat_ts) k=1, so areas ≈ nominal within the authalic tolerance."""
    from raster2dggs_spark.geo.crs import geodesic_row_areas_m2, ps_for_epsg

    ps = ps_for_epsg(3413)
    x0, y0 = ps.forward(np.array([30.0]), np.array([70.0]))
    affine = (100.0, 0.0, float(x0[0]), 0.0, -100.0, float(y0[0]))
    areas = geodesic_row_areas_m2(affine, 50, 40, "EPSG:3413")
    assert areas.shape == (40,)
    # the authalic-sphere bias is latitude-dependent (M·N/R_a² ≈ 1.0075
    # at lat 70 — the measured deviation matches it to 1e-4), so the
    # generic branch is good to ~1% at polar latitudes
    assert np.abs(areas / 1e4 - 1.0).max() < 1e-2
    assert (areas.max() - areas.min()) / 1e4 < 1e-4  # k constant locally


# ----------------------------------------------------------------------
# Conic + azimuthal families (round 6): LCC, Albers, LAEA


def test_conic_roundtrips():
    from raster2dggs_spark.geo.crs import conic_for_epsg

    for code, lonr, latr in ((2154, (-5, 9), (41, 51)),
                             (3347, (-140, -50), (42, 83)),
                             (5070, (-125, -66), (24, 50)),
                             (3035, (-10, 30), (35, 70))):
        p = conic_for_epsg(code)
        rng = np.random.default_rng(code)
        lon = rng.uniform(*lonr, 3000)
        lat = rng.uniform(*latr, 3000)
        x, y = p.forward(lon, lat)
        lon2, lat2 = p.inverse(x, y)
        assert np.abs(lon2 - lon).max() < 1e-11, code
        assert np.abs(lat2 - lat).max() < 1e-11, code


def test_lambert93_paris_known_coordinates():
    """Paris city centre in RGF93/Lambert-93 is the canonical published
    sanity point (~652.5 km E, ~6862 km N)."""
    from raster2dggs_spark.geo.crs import conic_for_epsg

    p = conic_for_epsg(2154)
    x, y = p.forward(np.array([2.3522]), np.array([48.8566]))
    assert abs(x[0] - 652_469) < 200 and abs(y[0] - 6_862_035) < 200


def _num_jacobian(p, lon0, lat0, h=1e-6):
    import math

    x0, y0 = p.forward(np.array([lon0]), np.array([lat0]))
    xl, yl = p.forward(np.array([lon0 + h]), np.array([lat0]))
    xp, yp = p.forward(np.array([lon0]), np.array([lat0 + h]))
    return np.array([[(xl - x0)[0], (xp - x0)[0]],
                     [(yl - y0)[0], (yp - y0)[0]]]) / math.radians(h)


def _MN(lat0):
    import math

    a = 6378137.0
    e2 = (1 / 298.257222101) * (2 - 1 / 298.257222101)
    s2 = math.sin(math.radians(lat0)) ** 2
    return (a * (1 - e2) / (1 - e2 * s2) ** 1.5,
            a / math.sqrt(1 - e2 * s2))


def test_lcc_conformal_and_unit_scale_at_parallels():
    """Numeric Jacobian isotropy everywhere (conformality) and k=1 at
    both standard parallels — the 2SP definition."""
    import math

    from raster2dggs_spark.geo.crs import conic_for_epsg

    p = conic_for_epsg(2154)
    for lat0, lon0 in ((44.0, 3.0), (49.0, 1.0), (46.5, 7.0)):
        J = _num_jacobian(p, lon0, lat0)
        M, N = _MN(lat0)
        A = J @ np.diag([1 / (N * math.cos(math.radians(lat0))), 1 / M])
        sv = np.linalg.svd(A, compute_uv=False)
        assert abs(sv[0] / sv[1] - 1.0) < 1e-6, lat0
        if lat0 in (44.0, 49.0):  # the standard parallels
            assert abs(sv[0] - 1.0) < 1e-6, lat0


def test_albers_laea_exact_equal_area():
    """|det J| equals the ellipsoidal area element M·N·cosφ at every
    probe — the equal-area property, checked against an independent
    formulation (no q-functions involved in the oracle side)."""
    import math

    from raster2dggs_spark.geo.crs import conic_for_epsg

    probes = {5070: ((30.0, -96.0), (45.0, -80.0), (38.0, -110.0)),
              3035: ((45.0, 10.0), (60.0, 25.0), (36.0, -8.0))}
    for code, pts in probes.items():
        p = conic_for_epsg(code)
        for lat0, lon0 in pts:
            J = _num_jacobian(p, lon0, lat0)
            M, N = _MN(lat0)
            ratio = abs(np.linalg.det(J)) / (M * N * math.cos(
                math.radians(lat0)))
            assert abs(ratio - 1.0) < 1e-6, (code, lat0)


def test_etrs_nad83_utm_aliases():
    """258xx/269xx are UTM on GRS80 — same zone arithmetic, GRS80 f."""
    from raster2dggs_spark.geo.crs import tm_for_epsg

    tm = tm_for_epsg(25832)  # ETRS89 / UTM 32N, lon0 9E
    x, y = tm.forward(np.array([9.0]), np.array([52.0]))
    assert abs(x[0] - 500000.0) < 1e-6
    tm2 = tm_for_epsg(26910)  # NAD83 / UTM 10N, lon0 -123
    x, y = tm2.forward(np.array([-123.0]), np.array([45.0]))
    assert abs(x[0] - 500000.0) < 1e-6


# --------------------------------------------------------------------------
# round 7: sinusoidal (MODIS) + ellipsoidal World Mercator 3395


def test_sinusoidal_roundtrip_identity():
    from raster2dggs_spark.geo.crs import from_lonlat, to_lonlat

    rng = np.random.default_rng(11)
    lon = rng.uniform(-179.9, 179.9, 4000)
    lat = rng.uniform(-89.5, 89.5, 4000)
    for crs in ("ESRI:54008", "SINU:5.0:100000.0:-2000.0:6371000.0"):
        x, y = from_lonlat(lon, lat, crs)
        lo, la = to_lonlat(x, y, crs)
        assert np.abs(lo - lon).max() < 1e-11
        assert np.abs(la - lat).max() < 1e-11


def test_sinusoidal_known_values_and_modis_sphere():
    """x = R·λ·cosφ, y = R·φ on the MODIS sphere R=6371007.181 — the
    closed form IS the definition, so pin it directly, plus the MODIS
    grid's famous global width 2·π·R ≈ 40031.6 km at the equator."""
    from raster2dggs_spark.geo.crs import MODIS_SPHERE_R, from_lonlat

    x, y = from_lonlat(np.array([10.0]), np.array([30.0]), "ESRI:54008")
    assert abs(x[0] - MODIS_SPHERE_R * np.radians(10.0)
               * np.cos(np.radians(30.0))) < 1e-9
    assert abs(y[0] - MODIS_SPHERE_R * np.radians(30.0)) < 1e-9
    # ±180 canonicalizes to -180 (the wrap is half-open): |x| = π·R
    xw, _ = from_lonlat(np.array([180.0]), np.array([0.0]), "ESRI:54008")
    assert abs(abs(xw[0]) - np.pi * MODIS_SPHERE_R) < 1e-6  # 20015.8 km


def test_sinusoidal_exact_equal_area_jacobian():
    """|∂(x,y)/∂(λ,φ)| ≡ R²cosφ (the sphere's area element) — numeric
    central differences at mid/high/low latitudes within 1e-6 relative."""
    from raster2dggs_spark.geo.crs import MODIS_SPHERE_R, from_lonlat

    eps = 1e-6
    for L, P in ((20.0, 45.0), (-120.0, -70.0), (170.0, 5.0),
                 (0.0, 85.0)):
        args = (np.array([L]), np.array([P]))
        x0, y0 = from_lonlat(*args, "ESRI:54008")
        xl, yl = from_lonlat(np.array([L + eps]), np.array([P]),
                             "ESRI:54008")
        xp, yp = from_lonlat(np.array([L]), np.array([P + eps]),
                             "ESRI:54008")
        J = ((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0)) / (
            np.radians(eps) ** 2)
        ratio = J[0] / (MODIS_SPHERE_R ** 2 * np.cos(np.radians(P)))
        assert abs(ratio - 1.0) < 1e-6, (L, P, ratio)


def test_mercator_3395_roundtrip_and_published_value():
    """EPSG:3395 inverse∘forward identity and the published y(60°N)
    value 8362698.5485 m (vs the spherical 3857's 8399737.89 — the
    37 km ellipsoidal correction is the whole point)."""
    from raster2dggs_spark.geo.crs import from_lonlat, to_lonlat

    rng = np.random.default_rng(12)
    lon = rng.uniform(-179.9, 179.9, 4000)
    lat = rng.uniform(-85.0, 85.0, 4000)
    x, y = from_lonlat(lon, lat, "EPSG:3395")
    lo, la = to_lonlat(x, y, "EPSG:3395")
    assert np.abs(lo - lon).max() < 1e-11
    assert np.abs(la - lat).max() < 1e-11
    _, y60 = from_lonlat(np.array([0.0]), np.array([60.0]), "EPSG:3395")
    assert abs(y60[0] - 8362698.5485) < 1e-3


def test_mercator_3395_matches_independent_ln_form():
    """The asinh(τ′) implementation equals the classic
    a·ln[tan(π/4+φ/2)·((1-e·sinφ)/(1+e·sinφ))^(e/2)] formulation
    (independent algebraic path) to sub-nanometer."""
    from raster2dggs_spark.geo.crs import from_lonlat

    a, f = 6378137.0, 1.0 / 298.257223563
    e = np.sqrt(f * (2.0 - f))
    lats = np.array([-80.0, -45.0, -10.0, 0.0, 15.0, 52.5, 75.0])
    phi = np.radians(lats)
    y_ind = a * np.log(np.tan(np.pi / 4.0 + phi / 2.0)
                       * ((1.0 - e * np.sin(phi))
                          / (1.0 + e * np.sin(phi))) ** (e / 2.0))
    _, y = from_lonlat(np.zeros_like(lats), lats, "EPSG:3395")
    assert np.abs(y - y_ind).max() < 1e-6


def test_sinusoidal_geotiff_roundtrip_user_defined_geokeys():
    """write→parse round-trip through the user-defined CT_Sinusoidal
    geokey form GDAL writes for MODIS (PCS=32767, CT=24, params in
    GeoDoubleParams) — both the canonical MODIS sphere and a
    custom-parameter variant."""
    import os
    import tempfile

    from raster2dggs_spark.sources.geotiff import (
        parse_geotiff, read_geotiff_local, write_geotiff)

    arr = np.arange(200, dtype=np.float32).reshape(1, 10, 20)
    for crs in ("ESRI:54008", "SINU:5.0:100000.0:-2000.0:6371000.0",
                "EPSG:3395"):
        with tempfile.NamedTemporaryFile(suffix=".tif",
                                         delete=False) as fh:
            p = fh.name
        try:
            write_geotiff(p, arr, (463.3, 0, -20015109.0, 0, -463.3,
                                   1111950.0), crs, tile=(16, 16))
            m = parse_geotiff(p)
            assert m["crs"] == crs
            assert np.array_equal(read_geotiff_local(p), arr)
        finally:
            os.unlink(p)


def test_antimeridian_wrap_tm_and_row_areas():
    """Round-7 ADVICE regressions: (1) TM forward wraps lon-lon0 into
    ±180° — a canonical lon on the far side of the antimeridian (UTM
    zone 1, Chatham's west half) projects to the SAME point as its
    +360° twin; (2) geodesic_row_areas_m2 over an antimeridian-
    straddling Chatham TM raster stays within sane bounds (no ±360°
    edge term)."""
    from raster2dggs_spark.geo.crs import (
        from_lonlat, geodesic_row_areas_m2)

    # UTM zone 1 (lon0=-177): a point at +177 must equal its -183 twin
    x1, y1 = from_lonlat(np.array([177.0]), np.array([10.0]),
                         "EPSG:32601")
    x2, y2 = from_lonlat(np.array([177.0 - 360.0]), np.array([10.0]),
                         "EPSG:32601")
    assert abs(x1[0] - x2[0]) < 1e-6 and abs(y1[0] - y2[0]) < 1e-6
    assert abs(x1[0]) < 5e6  # sane zone-frame coordinate, not garbage
    # Chatham TM raster whose lon/lat corners straddle the antimeridian
    x0, y0 = from_lonlat(np.array([179.9]), np.array([-43.9]),
                         "EPSG:3793")
    aff = (30.0, 0.0, float(x0[0]), 0.0, -30.0, float(y0[0]))
    areas = geodesic_row_areas_m2(aff, 2000, 64, "EPSG:3793")
    assert np.all(areas > 0)
    # 30 m pixels: true geodesic area within 2% of the nominal 900 m²
    assert np.all(np.abs(areas / 900.0 - 1.0) < 0.02)
