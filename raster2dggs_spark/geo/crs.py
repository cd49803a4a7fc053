"""Closed-form CRS transforms + geodesic areas (no pyproj offline).

The reference delegates to pyproj (/root/reference/raster2dggs/common.py:
803-813) and pyproj.Geod for areas (/root/reference/raster2dggs/common.py:
49-64, overlay.py:182-199).  We standardize the synthetic image table on
EPSG:4326 and EPSG:3857, and additionally implement ellipsoidal
Transverse Mercator (Krüger series, Karney 2011 "Transverse Mercator
with an accuracy of a few nanometers" — published, public) so real-world
UTM (EPSG:326xx/327xx) and national TM grids (NZTM 2193, Chatham 3793)
rasters georeference correctly, plus ellipsoidal polar stereographic
(EPSG method 9810/9829: NSIDC 3413/3976, Antarctic 3031, UPS
5041/5042) for polar rasters.  All NumPy-vectorized.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6378137.0  # WGS84 semi-major (spherical Mercator radius)
# authalic sphere radius — good to <0.2% for band areas vs full geodesic
EARTH_AUTHALIC_RADIUS_M = 6371007.1809

WGS84_F = 1.0 / 298.257223563
GRS80_F = 1.0 / 298.257222101  # NZGD2000 etc. (differs from WGS84 at 1e-10)


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


# --------------------------------------------------------------------------
# Ellipsoidal Transverse Mercator — 4th-order Krüger series (Karney 2011).
# Sub-millimeter within ±10° of the central meridian; round-trip identity
# <1e-11° (pinned in tests/test_geo.py).


def _tau_from_taup(taup, e2):
    """Geographic tangent tau from conformal tangent tau' by Newton
    (Karney eq. 19-21) — exact to machine precision, vectorized."""
    taup = np.asarray(taup, dtype=np.float64)
    e = np.sqrt(e2)
    tau = taup / np.sqrt(1.0 - e2)
    for _ in range(5):
        sigma = np.sinh(e * np.arctanh(e * tau / np.hypot(1.0, tau)))
        taup_i = (tau * np.sqrt(1.0 + sigma * sigma)
                  - sigma * np.hypot(1.0, tau))
        dtau = ((taup - taup_i) * (1.0 + (1.0 - e2) * tau * tau)
                / ((1.0 - e2) * np.hypot(1.0, taup_i) * np.hypot(1.0, tau)))
        tau = tau + dtau
    return tau


class TransverseMercator:
    """One TM projection instance (lon0/lat0/k0/x0/y0 on an a,f ellipsoid).

    Instances are tiny and cached per EPSG code; forward/inverse are
    fully vectorized over NumPy arrays.
    """

    def __init__(self, lon0: float, lat0: float = 0.0, k0: float = 0.9996,
                 x0: float = 500_000.0, y0: float = 0.0,
                 a: float = EARTH_RADIUS_M, f: float = WGS84_F):
        self.lon0, self.lat0, self.k0, self.x0, self.y0 = lon0, lat0, k0, x0, y0
        self.a, self.f = a, f
        n = f / (2.0 - f)
        self.n = n
        self.e2 = f * (2.0 - f)
        self.e = np.sqrt(self.e2)
        self.A = a / (1.0 + n) * (1.0 + n * n / 4.0 + n ** 4 / 64.0)
        n2, n3, n4 = n * n, n ** 3, n ** 4
        self.alpha = (
            n / 2.0 - 2.0 * n2 / 3.0 + 5.0 * n3 / 16.0 + 41.0 * n4 / 180.0,
            13.0 * n2 / 48.0 - 3.0 * n3 / 5.0 + 557.0 * n4 / 1440.0,
            61.0 * n3 / 240.0 - 103.0 * n4 / 140.0,
            49561.0 * n4 / 161280.0,
        )
        self.beta = (
            n / 2.0 - 2.0 * n2 / 3.0 + 37.0 * n3 / 96.0 - n4 / 360.0,
            n2 / 48.0 + n3 / 15.0 - 437.0 * n4 / 1440.0,
            17.0 * n3 / 480.0 - 37.0 * n4 / 840.0,
            4397.0 * n4 / 161280.0,
        )
        # northing of the latitude-of-origin (0 for lat0=0: UTM, NZTM, 3793)
        self._xi0 = 0.0
        if lat0 != 0.0:
            xi, _ = self._xi_eta(np.array([lat0]), np.array([lon0]))
            self._xi0 = float(xi[0])

    def _tau_prime(self, phi):
        """Conformal tangent tau' from geographic latitude (radians)."""
        s = np.sin(phi)
        sigma = np.sinh(self.e * np.arctanh(self.e * s))
        tau = np.tan(phi)
        return tau * np.sqrt(1.0 + sigma * sigma) - sigma * np.sqrt(
            1.0 + tau * tau)

    def _xi_eta(self, lat_deg, lon_deg):
        phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
        # TM is periodic in lon: wrap into ±180° of the central meridian
        # so canonical lons across the antimeridian (UTM zones 1/60, the
        # west half of Chatham 3793's lon0=-176.5 domain) don't produce
        # lam ≈ ∓357° garbage.
        dlon = np.asarray(lon_deg, dtype=np.float64) - self.lon0
        lam = np.radians((dlon + 180.0) % 360.0 - 180.0)
        taup = self._tau_prime(phi)
        cl = np.cos(lam)
        xi_p = np.arctan2(taup, cl)
        eta_p = np.arcsinh(np.sin(lam) / np.hypot(taup, cl))
        xi, eta = xi_p.copy(), eta_p.copy()
        for j, aj in enumerate(self.alpha, start=1):
            xi += aj * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
            eta += aj * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
        return xi, eta

    def forward(self, lon, lat):
        """(lon, lat) degrees -> projected (easting, northing) meters."""
        xi, eta = self._xi_eta(lat, lon)
        x = self.x0 + self.k0 * self.A * eta
        y = self.y0 + self.k0 * self.A * (xi - self._xi0)
        return x, y

    def inverse(self, x, y):
        """Projected (easting, northing) meters -> (lon, lat) degrees."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        eta = (x - self.x0) / (self.k0 * self.A)
        xi = (y - self.y0) / (self.k0 * self.A) + self._xi0
        xi_p, eta_p = xi.copy(), eta.copy()
        for j, bj in enumerate(self.beta, start=1):
            xi_p -= bj * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            eta_p -= bj * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
        # conformal tangent -> geographic via Newton: exact to machine
        # precision, no truncated rectifying series
        taup = np.sin(xi_p) / np.hypot(np.sinh(eta_p), np.cos(xi_p))
        tau = _tau_from_taup(taup, self.e2)
        lon = self.lon0 + np.degrees(lam)
        lat = np.degrees(np.arctan(tau))
        return lon, lat


class PolarStereographic:
    """Ellipsoidal polar stereographic (EPSG method 9810/9829): the
    projection family of real polar rasters (NSIDC sea-ice grids,
    Antarctic mosaics).  ``lat_ts`` (variant B) OR ``k0`` (variant A)
    fixes the scale; ``north`` selects the aspect.  Inverse recovers
    geographic latitude from the conformal tangent via the exact
    Newton shared with the TM implementation."""

    def __init__(self, lon0: float, north: bool, lat_ts: float | None = None,
                 k0: float | None = None, x0: float = 0.0, y0: float = 0.0,
                 a: float = EARTH_RADIUS_M, f: float = WGS84_F):
        self.lon0, self.north, self.x0, self.y0 = lon0, north, x0, y0
        self.a, self.e2 = a, f * (2.0 - f)
        self.e = np.sqrt(self.e2)
        if lat_ts is not None:
            phi_f = np.radians(abs(lat_ts))
            s = np.sin(phi_f)
            m_f = np.cos(phi_f) / np.sqrt(1.0 - self.e2 * s * s)
            t_f = (np.tan(np.pi / 4.0 - phi_f / 2.0)
                   / ((1.0 - self.e * s) / (1.0 + self.e * s))
                   ** (self.e / 2.0))
            # rho = a*m_f/t_f * t  ==  2*a*k0_eff/sqrt(...) * t
            self._rho0 = a * m_f / t_f
        elif k0 is not None:
            self._rho0 = (2.0 * a * k0
                          / np.sqrt((1.0 + self.e) ** (1.0 + self.e)
                                    * (1.0 - self.e) ** (1.0 - self.e)))
        else:
            raise ValueError("need lat_ts or k0")

    def _t(self, phi):
        s = np.sin(phi)
        return (np.tan(np.pi / 4.0 - phi / 2.0)
                / ((1.0 - self.e * s) / (1.0 + self.e * s))
                ** (self.e / 2.0))

    def forward(self, lon, lat):
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        sgn = 1.0 if self.north else -1.0
        phi = np.radians(sgn * lat)
        lam = np.radians(lon - self.lon0)
        rho = self._rho0 * self._t(phi)
        x = self.x0 + sgn * rho * np.sin(sgn * lam)
        y = self.y0 - sgn * rho * np.cos(sgn * lam)
        return x, y

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64) - self.x0
        y = np.asarray(y, dtype=np.float64) - self.y0
        sgn = 1.0 if self.north else -1.0
        rho = np.hypot(x, y)
        lam = sgn * np.arctan2(sgn * x, -sgn * y)
        t = rho / self._rho0
        # chi = pi/2 - 2*atan(t): tan(chi) is the conformal tangent
        taup = np.tan(np.pi / 2.0 - 2.0 * np.arctan(t))
        tau = _tau_from_taup(taup, self.e2)
        lat = sgn * np.degrees(np.arctan(tau))
        lon = self.lon0 + np.degrees(lam)
        lon = (lon + 180.0) % 360.0 - 180.0
        return lon, lat


class LambertConformalConic:
    """Ellipsoidal LCC 2SP (EPSG method 9802) — the mid-latitude
    national-grid family (France Lambert-93, Canada LCC, US State
    Plane).  Inverse latitude via the shared exact conformal Newton."""

    def __init__(self, lat1: float, lat2: float, lat0: float, lon0: float,
                 x0: float = 0.0, y0: float = 0.0,
                 a: float = EARTH_RADIUS_M, f: float = WGS84_F):
        self.lon0, self.x0, self.y0, self.a = lon0, x0, y0, a
        self.e2 = f * (2.0 - f)
        self.e = np.sqrt(self.e2)

        def m(phi):
            s = np.sin(phi)
            return np.cos(phi) / np.sqrt(1.0 - self.e2 * s * s)

        def t(phi):
            s = np.sin(phi)
            return (np.tan(np.pi / 4.0 - phi / 2.0)
                    / ((1.0 - self.e * s) / (1.0 + self.e * s))
                    ** (self.e / 2.0))

        p1, p2, p0 = (np.radians(v) for v in (lat1, lat2, lat0))
        if abs(lat1 - lat2) < 1e-12:
            self.n = np.sin(p1)
        else:
            self.n = ((np.log(m(p1)) - np.log(m(p2)))
                      / (np.log(t(p1)) - np.log(t(p2))))
        self.F = m(p1) / (self.n * t(p1) ** self.n)
        self.rho0 = a * self.F * t(p0) ** self.n
        self._t = t

    def forward(self, lon, lat):
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        rho = self.a * self.F * self._t(np.radians(lat)) ** self.n
        th = self.n * np.radians((lon - self.lon0 + 180.0) % 360.0 - 180.0)
        return (self.x0 + rho * np.sin(th),
                self.y0 + self.rho0 - rho * np.cos(th))

    def inverse(self, x, y):
        xp = np.asarray(x, dtype=np.float64) - self.x0
        yp = self.rho0 - (np.asarray(y, dtype=np.float64) - self.y0)
        sgn = np.sign(self.n) or 1.0
        rho = sgn * np.hypot(xp, yp)
        th = np.arctan2(sgn * xp, sgn * yp)
        lon = self.lon0 + np.degrees(th / self.n)
        tp = (rho / (self.a * self.F)) ** (1.0 / self.n)
        taup = np.tan(np.pi / 2.0 - 2.0 * np.arctan(tp))
        lat = np.degrees(np.arctan(_tau_from_taup(taup, self.e2)))
        return (lon + 180.0) % 360.0 - 180.0, lat


def _q_auth(phi, e, e2):
    """Authalic q-function (Snyder eq. 3-12) — the equal-area family's
    workhorse."""
    s = np.sin(phi)
    return (1.0 - e2) * (s / (1.0 - e2 * s * s)
                         - (1.0 / (2.0 * e))
                         * np.log((1.0 - e * s) / (1.0 + e * s)))


def _phi_from_q(q, e, e2):
    """Invert q(phi) by Newton (Snyder eq. 3-16), vectorized."""
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    for _ in range(6):
        s = np.sin(phi)
        dq = 2.0 * (1.0 - e2) * np.cos(phi) / (1.0 - e2 * s * s) ** 2
        dq = np.where(np.abs(dq) < 1e-300, 1e-300, dq)
        phi = phi + (q - _q_auth(phi, e, e2)) / dq
    return phi


class AlbersEqualArea:
    """Ellipsoidal Albers 2SP (EPSG method 9822) — CONUS 5070 etc.
    Exactly equal-area (Jacobian pinned numerically in tests)."""

    def __init__(self, lat1: float, lat2: float, lat0: float, lon0: float,
                 x0: float = 0.0, y0: float = 0.0,
                 a: float = EARTH_RADIUS_M, f: float = WGS84_F):
        self.lon0, self.x0, self.y0, self.a = lon0, x0, y0, a
        self.e2 = f * (2.0 - f)
        self.e = np.sqrt(self.e2)

        def m(phi):
            s = np.sin(phi)
            return np.cos(phi) / np.sqrt(1.0 - self.e2 * s * s)

        p1, p2, p0 = (np.radians(v) for v in (lat1, lat2, lat0))
        q1 = _q_auth(p1, self.e, self.e2)
        q2 = _q_auth(p2, self.e, self.e2)
        q0 = _q_auth(p0, self.e, self.e2)
        if abs(lat1 - lat2) < 1e-12:
            self.n = np.sin(p1)
        else:
            self.n = (m(p1) ** 2 - m(p2) ** 2) / (q2 - q1)
        self.C = m(p1) ** 2 + self.n * q1
        self.rho0 = a * np.sqrt(self.C - self.n * q0) / self.n

    def _rho(self, phi):
        q = _q_auth(phi, self.e, self.e2)
        return self.a * np.sqrt(self.C - self.n * q) / self.n

    def forward(self, lon, lat):
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        rho = self._rho(np.radians(lat))
        th = self.n * np.radians((lon - self.lon0 + 180.0) % 360.0 - 180.0)
        return (self.x0 + rho * np.sin(th),
                self.y0 + self.rho0 - rho * np.cos(th))

    def inverse(self, x, y):
        xp = np.asarray(x, dtype=np.float64) - self.x0
        yp = self.rho0 - (np.asarray(y, dtype=np.float64) - self.y0)
        sgn = np.sign(self.n) or 1.0
        rho = sgn * np.hypot(xp, yp)
        th = np.arctan2(sgn * xp, sgn * yp)
        lon = self.lon0 + np.degrees(th / self.n)
        q = (self.C - (rho * self.n / self.a) ** 2) / self.n
        lat = np.degrees(_phi_from_q(q, self.e, self.e2))
        return (lon + 180.0) % 360.0 - 180.0, lat


class LambertAzimuthalEqualArea:
    """Ellipsoidal LAEA oblique aspect (EPSG method 9820) — the EU
    standard grid ETRS89-LAEA (EPSG:3035)."""

    def __init__(self, lat0: float, lon0: float, x0: float = 0.0,
                 y0: float = 0.0, a: float = EARTH_RADIUS_M,
                 f: float = WGS84_F):
        self.lon0, self.x0, self.y0, self.a = lon0, x0, y0, a
        self.e2 = f * (2.0 - f)
        self.e = np.sqrt(self.e2)
        p0 = np.radians(lat0)
        self.qp = _q_auth(np.pi / 2.0, self.e, self.e2)
        q0 = _q_auth(p0, self.e, self.e2)
        self.b0 = np.arcsin(q0 / self.qp)
        self.Rq = a * np.sqrt(self.qp / 2.0)
        s0 = np.sin(p0)
        m0 = np.cos(p0) / np.sqrt(1.0 - self.e2 * s0 * s0)
        self.D = a * m0 / (self.Rq * np.cos(self.b0))

    def forward(self, lon, lat):
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        q = _q_auth(np.radians(lat), self.e, self.e2)
        b = np.arcsin(np.clip(q / self.qp, -1.0, 1.0))
        lam = np.radians(lon - self.lon0)
        denom = (1.0 + np.sin(self.b0) * np.sin(b)
                 + np.cos(self.b0) * np.cos(b) * np.cos(lam))
        B = self.Rq * np.sqrt(2.0 / denom)
        x = self.x0 + B * self.D * np.cos(b) * np.sin(lam)
        y = self.y0 + (B / self.D) * (np.cos(self.b0) * np.sin(b)
                                      - np.sin(self.b0) * np.cos(b)
                                      * np.cos(lam))
        return x, y

    def inverse(self, x, y):
        xp = (np.asarray(x, dtype=np.float64) - self.x0) / self.D
        yp = (np.asarray(y, dtype=np.float64) - self.y0) * self.D
        rho = np.hypot(xp, yp)
        ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * self.Rq), -1.0, 1.0))
        with np.errstate(invalid="ignore", divide="ignore"):
            b = np.where(
                rho < 1e-12, self.b0,
                np.arcsin(np.clip(
                    np.cos(ce) * np.sin(self.b0)
                    + yp * np.sin(ce) * np.cos(self.b0) / rho, -1.0, 1.0)))
            lam = np.arctan2(
                xp * np.sin(ce),
                rho * np.cos(self.b0) * np.cos(ce)
                - yp * np.sin(self.b0) * np.sin(ce))
        lam = np.where(rho < 1e-12, 0.0, lam)
        q = self.qp * np.sin(b)
        lat = np.degrees(_phi_from_q(q, self.e, self.e2))
        lon = self.lon0 + np.degrees(lam)
        return (lon + 180.0) % 360.0 - 180.0, lat


MODIS_SPHERE_R = 6371007.181  # MODIS sinusoidal sphere radius (meters)


class Sinusoidal:
    """Spherical sinusoidal — the MODIS land-product grid family
    (ESRI:54008-style; the reference reads these via pyproj,
    /root/reference/raster2dggs/common.py:803-813).  Exactly equal-area:
    x = R·λ·cosφ, y = R·φ, |J| = R²cosφ ≡ the sphere's area element
    (pinned numerically in tests/test_geo.py)."""

    def __init__(self, lon0: float = 0.0, x0: float = 0.0, y0: float = 0.0,
                 R: float = MODIS_SPHERE_R):
        self.lon0, self.x0, self.y0, self.R = lon0, x0, y0, R

    def forward(self, lon, lat):
        lon = np.asarray(lon, dtype=np.float64)
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians((lon - self.lon0 + 180.0) % 360.0 - 180.0)
        return (self.x0 + self.R * lam * np.cos(phi),
                self.y0 + self.R * phi)

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64) - self.x0
        y = np.asarray(y, dtype=np.float64) - self.y0
        phi = y / self.R
        c = np.cos(phi)
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = np.where(np.abs(c) < 1e-12, 0.0, x / (self.R * c))
        lon = self.lon0 + np.degrees(lam)
        return (lon + 180.0) % 360.0 - 180.0, np.degrees(phi)


class EllipsoidalMercator:
    """Ellipsoidal Mercator (EPSG method 9804/1026 — World Mercator
    EPSG:3395).  y = a·asinh(τ′) with the conformal tangent τ′ shared
    with the TM machinery; the inverse reuses the exact Newton
    ``_tau_from_taup`` — no truncated latitude series."""

    def __init__(self, lon0: float = 0.0, x0: float = 0.0, y0: float = 0.0,
                 a: float = EARTH_RADIUS_M, f: float = WGS84_F):
        self.lon0, self.x0, self.y0, self.a = lon0, x0, y0, a
        self.e2 = f * (2.0 - f)
        self.e = np.sqrt(self.e2)

    def forward(self, lon, lat):
        lon = np.asarray(lon, dtype=np.float64)
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        s = np.sin(phi)
        sigma = np.sinh(self.e * np.arctanh(self.e * s))
        tau = np.tan(phi)
        taup = tau * np.sqrt(1.0 + sigma * sigma) - sigma * np.sqrt(
            1.0 + tau * tau)
        lam = np.radians((lon - self.lon0 + 180.0) % 360.0 - 180.0)
        return self.x0 + self.a * lam, self.y0 + self.a * np.arcsinh(taup)

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64) - self.x0
        y = np.asarray(y, dtype=np.float64) - self.y0
        taup = np.sinh(y / self.a)
        tau = _tau_from_taup(taup, self.e2)
        lon = self.lon0 + np.degrees(x / self.a)
        return (lon + 180.0) % 360.0 - 180.0, np.degrees(np.arctan(tau))


_SINU_CACHE: dict[str, Sinusoidal] = {}


def sinusoidal_for_crs(crs: str) -> Sinusoidal | None:
    """Sinusoidal instance for ``ESRI:54008`` (MODIS sphere, lon0=0) or
    the self-describing ``SINU:<lon0>:<x0>:<y0>:<R>`` form the GeoTIFF
    reader emits for user-defined CT_Sinusoidal geokeys."""
    s = _SINU_CACHE.get(crs)
    if s is not None:
        return s
    up = str(crs).upper()
    if up == "ESRI:54008":
        s = Sinusoidal()
    elif up.startswith("SINU:"):
        try:
            lon0, x0, y0, R = (float(v) for v in up[5:].split(":"))
        except ValueError:
            return None
        s = Sinusoidal(lon0, x0, y0, R)
    else:
        return None
    _SINU_CACHE[crs] = s
    return s


_MERC_3395 = None


def _merc_3395() -> EllipsoidalMercator:
    global _MERC_3395
    if _MERC_3395 is None:
        _MERC_3395 = EllipsoidalMercator()
    return _MERC_3395


_CONIC_NAMED = {
    # code: (cls, kwargs)
    2154: (LambertConformalConic,  # RGF93 / Lambert-93 (GRS80)
           dict(lat1=49.0, lat2=44.0, lat0=46.5, lon0=3.0,
                x0=700_000.0, y0=6_600_000.0, f=GRS80_F)),
    3347: (LambertConformalConic,  # NAD83 / Statistics Canada Lambert
           dict(lat1=49.0, lat2=77.0, lat0=63.390675, lon0=-91.866667,
                x0=6_200_000.0, y0=3_000_000.0, f=GRS80_F)),
    5070: (AlbersEqualArea,        # NAD83 / Conus Albers
           dict(lat1=29.5, lat2=45.5, lat0=23.0, lon0=-96.0,
                x0=0.0, y0=0.0, f=GRS80_F)),
    3035: (LambertAzimuthalEqualArea,  # ETRS89-extended / LAEA Europe
           dict(lat0=52.0, lon0=10.0, x0=4_321_000.0, y0=3_210_000.0,
                f=GRS80_F)),
}

_CONIC_CACHE: dict[int, object] = {}


def conic_for_epsg(code: int):
    p = _CONIC_CACHE.get(code)
    if p is None and code in _CONIC_NAMED:
        cls, kw = _CONIC_NAMED[code]
        p = cls(**kw)
        _CONIC_CACHE[code] = p
    return p


_PS_NAMED = {
    # code: (lon0, north, lat_ts, k0, x0, y0)
    3413: (-45.0, True, 70.0, None, 0.0, 0.0),   # NSIDC north
    3031: (0.0, False, -71.0, None, 0.0, 0.0),   # Antarctic PS
    3976: (0.0, False, -70.0, None, 0.0, 0.0),   # NSIDC south
    5041: (0.0, True, None, 0.994, 2_000_000.0, 2_000_000.0),   # UPS N
    5042: (0.0, False, None, 0.994, 2_000_000.0, 2_000_000.0),  # UPS S
}

_PS_CACHE: dict[int, PolarStereographic] = {}


def ps_for_epsg(code: int) -> PolarStereographic | None:
    ps = _PS_CACHE.get(code)
    if ps is None and code in _PS_NAMED:
        lon0, north, lat_ts, k0, x0, y0 = _PS_NAMED[code]
        ps = PolarStereographic(lon0, north, lat_ts=lat_ts, k0=k0,
                                x0=x0, y0=y0)
        _PS_CACHE[code] = ps
    return ps


_TM_NAMED = {
    # code: (lon0, lat0, k0, x0, y0, f)
    2193: (173.0, 0.0, 0.9996, 1_600_000.0, 10_000_000.0, GRS80_F),  # NZTM2000
    3793: (-176.5, 0.0, 1.0, 3_500_000.0, 10_000_000.0, GRS80_F),  # Chatham TM
}

_TM_CACHE: dict[int, TransverseMercator] = {}


def tm_for_epsg(code: int) -> TransverseMercator | None:
    """TransverseMercator for an EPSG code, or None if not a TM CRS we
    know: UTM WGS84 north 32601-32660 / south 32701-32760, plus the named
    national grids in ``_TM_NAMED``."""
    tm = _TM_CACHE.get(code)
    if tm is not None:
        return tm
    if 32601 <= code <= 32660:
        p = ((code - 32600) * 6.0 - 183.0, 0.0, 0.9996, 500_000.0, 0.0,
             WGS84_F)
    elif 32701 <= code <= 32760:
        p = ((code - 32700) * 6.0 - 183.0, 0.0, 0.9996, 500_000.0,
             10_000_000.0, WGS84_F)
    elif 25828 <= code <= 25838:  # ETRS89 / UTM (GRS80)
        p = ((code - 25800) * 6.0 - 183.0, 0.0, 0.9996, 500_000.0, 0.0,
             GRS80_F)
    elif 26901 <= code <= 26923:  # NAD83 / UTM (GRS80)
        p = ((code - 26900) * 6.0 - 183.0, 0.0, 0.9996, 500_000.0, 0.0,
             GRS80_F)
    elif code in _TM_NAMED:
        p = _TM_NAMED[code]
    else:
        return None
    tm = TransverseMercator(lon0=p[0], lat0=p[1], k0=p[2], x0=p[3],
                            y0=p[4], f=p[5])
    _TM_CACHE[code] = tm
    return tm


def _epsg_code(crs: str) -> int:
    try:
        return int(str(crs).upper().replace("EPSG:", ""))
    except ValueError:
        return -1


def to_lonlat(x, y, crs: str):
    """Projected coords in ``crs`` -> WGS84 lon/lat degrees (generic
    dispatcher: 4326 identity, 3857 closed form, TM family via Krüger)."""
    if crs == "EPSG:4326":
        return (np.asarray(x, dtype=np.float64),
                np.asarray(y, dtype=np.float64))
    if crs == "EPSG:3857":
        return mercator_to_lonlat(x, y)
    sn = sinusoidal_for_crs(crs)
    if sn is not None:
        return sn.inverse(x, y)
    code = _epsg_code(crs)
    if code == 3395:
        return _merc_3395().inverse(x, y)
    tm = tm_for_epsg(code)
    if tm is not None:
        return tm.inverse(x, y)
    ps = ps_for_epsg(code)
    if ps is not None:
        return ps.inverse(x, y)
    cp = conic_for_epsg(code)
    if cp is not None:
        return cp.inverse(x, y)
    raise ValueError(f"unsupported crs {crs!r} (offline: 4326, 3857, 3395, "
                     "UTM 326xx/327xx/258xx/269xx, NZTM 2193, Chatham 3793, "
                     "polar stereographic 3413/3031/3976/5041/5042, LCC "
                     "2154/3347, Albers 5070, LAEA 3035, sinusoidal "
                     "ESRI:54008 / SINU:lon0:x0:y0:R)")


def from_lonlat(lon, lat, crs: str):
    """WGS84 lon/lat degrees -> projected coords in ``crs`` (inverse of
    ``to_lonlat``)."""
    if crs == "EPSG:4326":
        return (np.asarray(lon, dtype=np.float64),
                np.asarray(lat, dtype=np.float64))
    if crs == "EPSG:3857":
        return lonlat_to_mercator(lon, lat)
    sn = sinusoidal_for_crs(crs)
    if sn is not None:
        return sn.forward(lon, lat)
    code = _epsg_code(crs)
    if code == 3395:
        return _merc_3395().forward(lon, lat)
    tm = tm_for_epsg(code)
    if tm is not None:
        return tm.forward(lon, lat)
    ps = ps_for_epsg(code)
    if ps is not None:
        return ps.forward(lon, lat)
    cp = conic_for_epsg(code)
    if cp is not None:
        return cp.forward(lon, lat)
    raise ValueError(f"unsupported crs {crs!r} (offline: 4326, 3857, 3395, "
                     "UTM 326xx/327xx/258xx/269xx, NZTM 2193, Chatham 3793, "
                     "polar stereographic 3413/3031/3976/5041/5042, LCC "
                     "2154/3347, Albers 5070, LAEA 3035, sinusoidal "
                     "ESRI:54008 / SINU:lon0:x0:y0:R)")


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
    # generic projected CRS (TM family): transform the 4 corners of the
    # row-centre pixel and take the spherical shoelace ("sinusoidal"
    # lon×sin(lat) polygon area — exact for infinitesimal quads, and TM
    # scale varies negligibly across one raster row)
    col = w / 2.0
    quads = []
    for dc, dr in ((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)):
        x = a * (col + dc) + b * (rows + dr) + c
        y = d * (col + dc) + e * (rows + dr) + f
        quads.append(to_lonlat(x, y, crs))
    area = np.zeros(h, dtype=np.float64)
    for i in range(4):
        lon1, lat1 = quads[i]
        lon2, lat2 = quads[(i + 1) % 4]
        # wrap each edge delta: a pixel straddling the antimeridian
        # (UTM zone 1/60, Chatham TM) must not contribute a ±360° term
        dlon = (lon2 - lon1 + 180.0) % 360.0 - 180.0
        area += np.radians(dlon) * (
            np.sin(np.radians(lat1)) + np.sin(np.radians(lat2))) / 2.0
    r = EARTH_AUTHALIC_RADIUS_M
    return np.abs(area) * r * r
