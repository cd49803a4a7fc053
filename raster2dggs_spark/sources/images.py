"""Deterministic synthetic image+caption table (BASELINE.json input_hint).

One row ≙ one georeferenced raster tile ≙ one GDAL block window in the
reference (/root/reference/raster2dggs/common.py:831-835).  Scenarios mirror
the reference's semantic fixture suite (/root/reference/make_samples.py:
133-634 and tests/classes/helpers.py:7-56) — see FIXTURES.md §2.

Everything is seeded NumPy; the same (n_images, seed) always produces
byte-identical payloads, captions and phashes, so tests can recompute
ground truth without storing golden files.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from raster2dggs_spark.codecs import encode_image, average_hash64

from pyspark.sql import types as T

IMAGE_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("bytes", T.BinaryType(), False),
    T.StructField("w", T.IntegerType(), False),
    T.StructField("h", T.IntegerType(), False),
    T.StructField("fmt", T.StringType(), False),
    T.StructField("caption", T.StringType(), False),
    T.StructField("phash", T.LongType(), False),
    T.StructField("affine_a", T.DoubleType(), False),
    T.StructField("affine_b", T.DoubleType(), False),
    T.StructField("affine_c", T.DoubleType(), False),
    T.StructField("affine_d", T.DoubleType(), False),
    T.StructField("affine_e", T.DoubleType(), False),
    T.StructField("affine_f", T.DoubleType(), False),
    T.StructField("crs", T.StringType(), False),
    T.StructField("nodata", T.DoubleType(), True),
    T.StructField("bands", T.IntegerType(), False),
    T.StructField("band_names", T.ArrayType(T.StringType()), True),
])

SCENARIOS = (
    "uniform42",
    "gradient",
    "landcover",
    "popcount",
    "temp_mean",
    "multiband_nodata",
    "geodesic2px",
    "skew_coastline",
)

_SENTINEL = -9999.0


def _pixels(scenario: str, rng: np.random.Generator, w: int, h: int):
    """(bands, h, w) float32 pixels + nodata value (or None) + band names."""
    if scenario == "uniform42":
        arr = np.full((1, h, w), 42.0, dtype=np.float32)
        if rng.random() < 0.5:
            arr[0, 0, 0] = _SENTINEL
            return arr, _SENTINEL, None
        return arr, None, None
    if scenario == "gradient":
        arr = np.arange(h * w, dtype=np.float32).reshape(1, h, w)
        return arr, None, None
    if scenario == "landcover":
        # piecewise-constant classes 1..6 in vertical stripes + holes
        classes = rng.integers(1, 7, size=max(2, w // 4))
        arr = np.repeat(classes, int(np.ceil(w / len(classes))))[:w]
        arr = np.tile(arr, (h, 1)).astype(np.float32)[None]
        holes = rng.random((h, w)) < 0.05
        arr[0][holes] = _SENTINEL
        return arr, _SENTINEL, ["landcover"]
    if scenario == "popcount":
        # heavy-tailed counts
        arr = np.floor(rng.pareto(1.5, (1, h, w)) * 10).astype(np.float32)
        return arr, None, ["pop"]
    if scenario == "temp_mean":
        yy, xx = np.mgrid[0:h, 0:w]
        arr = (15 + 10 * np.sin(xx / max(w, 2) * np.pi) *
               np.cos(yy / max(h, 2) * np.pi)).astype(np.float32)[None]
        arr = arr + rng.normal(0, 0.1, (1, h, w)).astype(np.float32)
        return arr, np.nan, None
    if scenario == "multiband_nodata":
        arr = rng.uniform(0, 100, (4, h, w)).astype(np.float32)
        for b in range(4):  # nodata at different pixels per band
            m = rng.random((h, w)) < 0.15
            arr[b][m] = _SENTINEL
        return arr, _SENTINEL, ["red", "green", "blue", "nir"]
    if scenario == "geodesic2px":
        arr = np.array([[[0.0], [10.0]]], dtype=np.float32)  # 1 band, 2 rows
        return arr, None, None
    if scenario == "skew_coastline":
        arr = rng.uniform(0, 1, (1, h, w)).astype(np.float32)
        return arr, None, None
    raise ValueError(scenario)


def _georef(scenario: str, rng: np.random.Generator, w: int, h: int):
    """North-up affine + crs. skew_coastline clusters tiles on a synthetic
    coastline band (north-rule skew fixture, FIXTURES.md §2)."""
    if scenario == "geodesic2px":
        lon0 = rng.uniform(-170, 170)
        lat0 = rng.uniform(20, 60)
        return (0.9, 0.0, lon0, 0.0, -30.0, lat0), "EPSG:4326"
    if scenario == "skew_coastline":
        lon0 = rng.uniform(-30.0, -29.0)  # tight lon band
        lat0 = 10.0 * np.sin(lon0 / 5.0) + rng.uniform(-0.05, 0.05)
        px = 0.2 / max(w, h)
        return (px, 0.0, lon0, 0.0, -px, lat0), "EPSG:4326"
    lon0 = rng.uniform(-175, 170)
    lat0 = rng.uniform(-80, 80)
    ext = rng.uniform(0.05, 2.0)
    if rng.random() < 0.25 and abs(lat0) < 70:
        from raster2dggs_spark.geo import lonlat_to_mercator

        x0, y0 = lonlat_to_mercator(np.array([lon0]), np.array([lat0]))
        m = ext * 111_000.0
        return (m / w, 0.0, float(x0[0]), 0.0, -m / h, float(y0[0])), "EPSG:3857"
    return (ext / w, 0.0, lon0, 0.0, -ext / h, lat0), "EPSG:4326"


def generate_images_pdf(
    n_images: int,
    seed: int = 42,
    scenarios=SCENARIOS,
    size_range=(8, 48),
) -> pd.DataFrame:
    """Deterministic pandas image table (FIXTURES.md §1 schema)."""
    rows = []
    for i in range(n_images):
        rng = np.random.default_rng(np.random.SeedSequence([seed, i]))
        scenario = scenarios[i % len(scenarios)]
        if scenario == "geodesic2px":
            w, h = 1, 2
        else:
            w = int(rng.integers(size_range[0], size_range[1] + 1))
            h = int(rng.integers(size_range[0], size_range[1] + 1))
        arr, nodata, band_names = _pixels(scenario, rng, w, h)
        affine, crs = _georef(scenario, rng, w, h)
        fmt = ("raw", "zlib", "q8")[i % 3]
        if fmt == "q8" and (arr == _SENTINEL).any():
            fmt = "zlib"  # keep sentinel exact for nodata fixtures
        payload = encode_image(arr, fmt)
        rows.append({
            "image_id": f"img_{scenario}_{i:08d}",
            "bytes": payload,
            "w": w,
            "h": h,
            "fmt": fmt,
            "caption": f"{scenario} tile {i} of seed {seed}",
            "phash": average_hash64(arr[0]),
            "affine_a": affine[0],
            "affine_b": affine[1],
            "affine_c": affine[2],
            "affine_d": affine[3],
            "affine_e": affine[4],
            "affine_f": affine[5],
            "crs": crs,
            "nodata": None if nodata is None else float(nodata),
            "bands": arr.shape[0],
            "band_names": band_names,
        })
    return pd.DataFrame(rows)


_TM_ANCHORS = (
    # (crs, anchor lon, anchor lat) — one per TM family the offline CRS
    # layer supports: two UTM zones (N+S hemisphere), NZTM, Chatham
    ("EPSG:32610", -122.3, 47.5),
    ("EPSG:32718", -76.9, -12.1),
    ("EPSG:2193", 172.6, -43.5),
    ("EPSG:3793", -176.3, -44.0),
)


def generate_tm_images_pdf(n_images: int, seed: int = 42,
                           size_range=(12, 28)) -> pd.DataFrame:
    """Deterministic TM-georeferenced ramp tiles (round 6): the UTM /
    national-grid twin of the 4326/3857 generator — affines are meters
    in a Transverse Mercator CRS, pixel ~30 m, values a per-tile ramp
    (decode-exact, so oracle replays need no float gymnastics)."""
    from raster2dggs_spark.geo.crs import from_lonlat

    rows = []
    for i in range(n_images):
        rng = np.random.default_rng(np.random.SeedSequence([seed, 7, i]))
        crs, lon_a, lat_a = _TM_ANCHORS[i % len(_TM_ANCHORS)]
        w = int(rng.integers(size_range[0], size_range[1] + 1))
        h = int(rng.integers(size_range[0], size_range[1] + 1))
        lon0 = lon_a + float(rng.uniform(-0.4, 0.4))
        lat0 = lat_a + float(rng.uniform(-0.4, 0.4))
        x0, y0 = from_lonlat(np.array([lon0]), np.array([lat0]), crs)
        px = float(rng.uniform(20.0, 40.0))
        affine = (px, 0.0, float(x0[0]), 0.0, -px, float(y0[0]))
        arr = (np.arange(h * w, dtype=np.float32).reshape(1, h, w)
               + np.float32(i))
        payload = encode_image(arr, "raw")
        rows.append({
            "image_id": f"img_tm_{i:08d}",
            "bytes": payload,
            "w": w, "h": h, "fmt": "raw",
            "caption": f"tm ramp tile {i} of seed {seed} ({crs})",
            "phash": average_hash64(arr[0]),
            "affine_a": affine[0], "affine_b": affine[1],
            "affine_c": affine[2], "affine_d": affine[3],
            "affine_e": affine[4], "affine_f": affine[5],
            "crs": crs, "nodata": None, "bands": 1, "band_names": None,
        })
    return pd.DataFrame(rows)


_PS_ANCHORS = (
    ("EPSG:3413", 30.0, 75.0),
    ("EPSG:3031", -60.0, -75.0),
    ("EPSG:3976", 140.0, -72.0),
    ("EPSG:5041", -100.0, 84.0),
)


def generate_polar_images_pdf(n_images: int, seed: int = 42,
                              size_range=(12, 28)) -> pd.DataFrame:
    """Polar-stereographic ramp tiles (round 6): NSIDC north/south,
    Antarctic PS and UPS anchors — meters-affine near the poles, where
    Mercator/TM georeferencing fails.  Same decode-exact ramp contract
    as the TM twin."""
    from raster2dggs_spark.geo.crs import from_lonlat

    rows = []
    for i in range(n_images):
        rng = np.random.default_rng(np.random.SeedSequence([seed, 9, i]))
        crs, lon_a, lat_a = _PS_ANCHORS[i % len(_PS_ANCHORS)]
        w = int(rng.integers(size_range[0], size_range[1] + 1))
        h = int(rng.integers(size_range[0], size_range[1] + 1))
        lon0 = lon_a + float(rng.uniform(-2.0, 2.0))
        lat0 = lat_a + float(rng.uniform(-0.4, 0.4))
        x0, y0 = from_lonlat(np.array([lon0]), np.array([lat0]), crs)
        px = float(rng.uniform(50.0, 100.0))
        affine = (px, 0.0, float(x0[0]), 0.0, -px, float(y0[0]))
        arr = (np.arange(h * w, dtype=np.float32).reshape(1, h, w)
               + np.float32(i))
        payload = encode_image(arr, "raw")
        rows.append({
            "image_id": f"img_ps_{i:08d}",
            "bytes": payload,
            "w": w, "h": h, "fmt": "raw",
            "caption": f"polar ramp tile {i} of seed {seed} ({crs})",
            "phash": average_hash64(arr[0]),
            "affine_a": affine[0], "affine_b": affine[1],
            "affine_c": affine[2], "affine_d": affine[3],
            "affine_e": affine[4], "affine_f": affine[5],
            "crs": crs, "nodata": None, "bands": 1, "band_names": None,
        })
    return pd.DataFrame(rows)


_CONIC_ANCHORS = (
    ("EPSG:2154", 2.35, 46.8),    # France Lambert-93
    ("EPSG:3347", -95.0, 55.0),   # Statistics Canada LCC
    ("EPSG:5070", -98.0, 39.0),   # CONUS Albers
    ("EPSG:3035", 10.0, 50.0),    # ETRS89-LAEA Europe
)


def generate_conic_images_pdf(n_images: int, seed: int = 42,
                              size_range=(12, 28)) -> pd.DataFrame:
    """Conic/azimuthal-family ramp tiles (round 6): LCC (France/Canada),
    Albers (CONUS) and LAEA (EU grid) anchors — the mid-latitude
    national-grid projections.  Same decode-exact ramp contract as the
    TM and polar twins."""
    from raster2dggs_spark.geo.crs import from_lonlat

    rows = []
    for i in range(n_images):
        rng = np.random.default_rng(np.random.SeedSequence([seed, 13, i]))
        crs, lon_a, lat_a = _CONIC_ANCHORS[i % len(_CONIC_ANCHORS)]
        w = int(rng.integers(size_range[0], size_range[1] + 1))
        h = int(rng.integers(size_range[0], size_range[1] + 1))
        lon0 = lon_a + float(rng.uniform(-3.0, 3.0))
        lat0 = lat_a + float(rng.uniform(-2.0, 2.0))
        x0, y0 = from_lonlat(np.array([lon0]), np.array([lat0]), crs)
        px = float(rng.uniform(30.0, 60.0))
        affine = (px, 0.0, float(x0[0]), 0.0, -px, float(y0[0]))
        arr = (np.arange(h * w, dtype=np.float32).reshape(1, h, w)
               + np.float32(i))
        payload = encode_image(arr, "raw")
        rows.append({
            "image_id": f"img_conic_{i:08d}",
            "bytes": payload,
            "w": w, "h": h, "fmt": "raw",
            "caption": f"conic ramp tile {i} of seed {seed} ({crs})",
            "phash": average_hash64(arr[0]),
            "affine_a": affine[0], "affine_b": affine[1],
            "affine_c": affine[2], "affine_d": affine[3],
            "affine_e": affine[4], "affine_f": affine[5],
            "crs": crs, "nodata": None, "bands": 1, "band_names": None,
        })
    return pd.DataFrame(rows)


_SINU_ANCHORS = (
    # sinusoidal (MODIS sphere + a custom-parameter variant) and World
    # Mercator 3395 — the round-7 CRS families.  High-|lat| anchors
    # exercise the sinusoidal shear where corner bboxes would fail.
    ("ESRI:54008", -100.0, 45.0),
    ("ESRI:54008", 140.0, -65.0),
    ("SINU:5.0:100000.0:-2000.0:6371000.0", 12.0, 8.0),
    ("EPSG:3395", -70.0, 60.0),
)


def generate_sinu_images_pdf(n_images: int, seed: int = 42,
                             size_range=(12, 28)) -> pd.DataFrame:
    """Sinusoidal/ellipsoidal-Mercator ramp tiles (round 7): the MODIS
    land-grid family (ESRI:54008 sphere sinusoidal + a shifted custom
    SINU variant) and World Mercator EPSG:3395 — reference capability:
    arbitrary-CRS rasters via pyproj (common.py:803-813).  Same
    decode-exact ramp contract as the TM/polar/conic twins."""
    from raster2dggs_spark.geo.crs import from_lonlat

    rows = []
    for i in range(n_images):
        rng = np.random.default_rng(np.random.SeedSequence([seed, 17, i]))
        crs, lon_a, lat_a = _SINU_ANCHORS[i % len(_SINU_ANCHORS)]
        w = int(rng.integers(size_range[0], size_range[1] + 1))
        h = int(rng.integers(size_range[0], size_range[1] + 1))
        lon0 = lon_a + float(rng.uniform(-2.0, 2.0))
        lat0 = lat_a + float(rng.uniform(-1.0, 1.0))
        x0, y0 = from_lonlat(np.array([lon0]), np.array([lat0]), crs)
        px = float(rng.uniform(200.0, 500.0))  # MODIS-scale pixels
        affine = (px, 0.0, float(x0[0]), 0.0, -px, float(y0[0]))
        arr = (np.arange(h * w, dtype=np.float32).reshape(1, h, w)
               + np.float32(i))
        payload = encode_image(arr, "raw")
        rows.append({
            "image_id": f"img_sinu_{i:08d}",
            "bytes": payload,
            "w": w, "h": h, "fmt": "raw",
            "caption": f"sinusoidal ramp tile {i} of seed {seed} ({crs})",
            "phash": average_hash64(arr[0]),
            "affine_a": affine[0], "affine_b": affine[1],
            "affine_c": affine[2], "affine_d": affine[3],
            "affine_e": affine[4], "affine_f": affine[5],
            "crs": crs, "nodata": None, "bands": 1, "band_names": None,
        })
    return pd.DataFrame(rows)


def generate_terrain_images_pdf(n_images: int = 16) -> pd.DataFrame:
    """Planar-ramp elevation tiles in EPSG:3857 whose geometry and
    values are pure INTEGER arithmetic in the tile index i — so a SQL
    oracle can recompute the closed-form Horn derivatives of every tile
    from ``range(n)`` alone (slope of the plane z = s*(row*w + col) + i
    is atan(s*sqrt(1+w^2)/px), constant over the interior)."""
    rows = []
    for i in range(n_images):
        w = 12 + (i * 5) % 7
        h = 12 + (i * 3) % 7
        px = float(50 + 10 * ((i * 7) % 8))
        s = float(1 + i % 3)
        x0 = 10_000.0 * i
        y0 = 5_000.0 * i
        arr = ((np.arange(h * w, dtype=np.float64) * s + i)
               .reshape(1, h, w).astype(np.float32))
        payload = encode_image(arr, "raw")
        rows.append({
            "image_id": f"img_terrain_{i:08d}",
            "bytes": payload,
            "w": w, "h": h, "fmt": "raw",
            "caption": f"terrain ramp tile {i}",
            "phash": average_hash64(arr[0]),
            "affine_a": px, "affine_b": 0.0, "affine_c": x0,
            "affine_d": 0.0, "affine_e": -px, "affine_f": y0,
            "crs": "EPSG:3857", "nodata": None, "bands": 1,
            "band_names": None,
        })
    return pd.DataFrame(rows)


def generate_d8_images_pdf(n_images: int = 16) -> pd.DataFrame:
    """Tilted-plane elevation tiles in EPSG:3857 with per-tile INTEGER
    gradient (gx, gy) in grid units: z = i + s*(gy*row + gx*col).  The
    D8 steepest-descent code of every interior pixel is then a pure
    argmax over 8 closed-form drops a SQL oracle can replay from
    ``range(n)``; tile 15 is forced flat (gx = gy = 0) to pin the
    no-descent path.  All values are small integers — exact in float32
    and in every engine's float64 arithmetic."""
    rows = []
    for i in range(n_images):
        w = 12 + (i * 5) % 7
        h = 12 + (i * 3) % 7
        px = float(50 + 10 * ((i * 7) % 8))
        s = float(1 + i % 3)
        gx = (i * 3) % 7 - 3
        gy = (i * 5) % 7 - 3
        if i == n_images - 1:
            gx = gy = 0
        r_idx, c_idx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        arr = ((gy * r_idx + gx * c_idx) * s + i).astype(np.float32)[None]
        payload = encode_image(arr, "raw")
        rows.append({
            "image_id": f"img_d8_{i:08d}",
            "bytes": payload,
            "w": w, "h": h, "fmt": "raw",
            "caption": f"d8 plane tile {i} grad ({gx},{gy})",
            "phash": average_hash64(arr[0]),
            "affine_a": px, "affine_b": 0.0, "affine_c": 10_000.0 * i,
            "affine_d": 0.0, "affine_e": -px, "affine_f": 5_000.0 * i,
            "crs": "EPSG:3857", "nodata": None, "bands": 1,
            "band_names": None,
        })
    return pd.DataFrame(rows)


def generate_valley_images_pdf(n_images: int = 16) -> pd.DataFrame:
    """V-shaped valley elevation tiles in EPSG:3857 for flow
    ACCUMULATION: ``z = s * (2*|col - cm| + h - row) + i`` with an
    integer trough column ``cm`` — both valley walls drain diagonally
    into the trough (SW east of it, SE west of it; drop 3s/(px*sqrt2)
    beats the 2s/px cardinal), the trough drains due south, so flow
    CONVERGES and per-pixel upstream counts are nontrivial.  All
    values are small integers times s — exact in float32 and every
    engine's float64 — and the 8 per-pixel drops have the closed form
    ``s*(2*abs(u) - 2*abs(u+dc) + dr)/dist`` (u = col-cm) that a SQL
    oracle replays generically with abs(), then accumulates by
    recursive transitive closure."""
    rows = []
    for i in range(n_images):
        w = 12 + (i * 5) % 7
        h = 12 + (i * 3) % 7
        px = float(50 + 10 * ((i * 7) % 8))
        s = float(1 + i % 3)
        cm = 2 + (i * 3) % (w - 4)
        r_idx, c_idx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        arr = ((2 * np.abs(c_idx - cm) + (h - r_idx)) * s + i).astype(
            np.float32)[None]
        payload = encode_image(arr, "raw")
        rows.append({
            "image_id": f"img_valley_{i:08d}",
            "bytes": payload,
            "w": w, "h": h, "fmt": "raw",
            "caption": f"valley tile {i} trough col {cm}",
            "phash": average_hash64(arr[0]),
            "affine_a": px, "affine_b": 0.0, "affine_c": 10_000.0 * i,
            "affine_d": 0.0, "affine_e": -px, "affine_f": 5_000.0 * i,
            "crs": "EPSG:3857", "nodata": None, "bands": 1,
            "band_names": None,
        })
    return pd.DataFrame(rows)


def generate_basin_images_pdf(n_images: int = 16) -> pd.DataFrame:
    """Egg-carton elevation tiles in EPSG:3857 for WATERSHED labelling:
    ``z = ((3*r*r + 5*c*c + 7*r*c + i) % 31) * s`` — a quasi-random
    but closed-form integer surface with many local minima (pits) and
    edge outflows, so the D8 drainage forest has rich multi-basin
    structure.  All values are small integers times s — exact in
    float32 and every engine's float64 — and a SQL oracle replays the
    drops GENERICALLY as ``(z(r,c) - z(r+dr,c+dc)) / dist`` from the
    same formula (same IEEE divide, same scan-order argmax
    tie-break)."""
    rows = []
    for i in range(n_images):
        w = 12 + (i * 5) % 7
        h = 12 + (i * 3) % 7
        px = float(50 + 10 * ((i * 7) % 8))
        s = float(1 + i % 3)
        r_idx, c_idx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        zi = (3 * r_idx * r_idx + 5 * c_idx * c_idx
              + 7 * r_idx * c_idx + i) % 31
        arr = (zi * s).astype(np.float32)[None]
        payload = encode_image(arr, "raw")
        rows.append({
            "image_id": f"img_basin_{i:08d}",
            "bytes": payload,
            "w": w, "h": h, "fmt": "raw",
            "caption": f"egg-carton basin tile {i}",
            "phash": average_hash64(arr[0]),
            "affine_a": px, "affine_b": 0.0, "affine_c": 10_000.0 * i,
            "affine_d": 0.0, "affine_e": -px, "affine_f": 5_000.0 * i,
            "crs": "EPSG:3857", "nodata": None, "bands": 1,
            "band_names": None,
        })
    return pd.DataFrame(rows)


def generate_scene_stack_pdf(n_footprints: int, epochs: int = 3,
                             seed: int = 7, size_range=(14, 20)):
    """Deterministic multi-epoch scene stacks for compositing (round 7):
    each footprint is observed ``epochs`` times with IDENTICAL geometry
    (same affine/w/h — the resampled-to-common-grid shape of an EO
    archive) but epoch-varying values.  Returns ``(images_pdf,
    meta_pdf)`` — the image table plus a STAC-style scene catalog
    ``(image_id, footprint, epoch, scene_ts)``.

    All four bands are INTEGER-valued float32 ramps (band_4 is the
    per-pixel QA band): sums of small integers are exact in float64
    regardless of association order, so per-(scene, cell) means are
    bit-identical between any single-node replay and the distributed
    plan — the property the composite oracles rest on.  No nodata."""
    img_rows, meta_rows = [], []
    for f in range(n_footprints):
        rng = np.random.default_rng(np.random.SeedSequence([seed, 23, f]))
        w = int(rng.integers(size_range[0], size_range[1] + 1))
        h = int(rng.integers(size_range[0], size_range[1] + 1))
        lon0 = float(rng.uniform(-170.0, 170.0))
        lat0 = float(rng.uniform(-60.0, 60.0))
        ext = float(rng.uniform(0.2, 0.8))
        affine = (ext / w, 0.0, lon0, 0.0, -ext / h, lat0)
        base = np.arange(h * w, dtype=np.int64).reshape(h, w)
        for t in range(epochs):
            arr = np.stack([
                (base % 97) + 13 * t,
                (base * 3) % 251 + t,
                np.full((h, w), f * 10 + t, dtype=np.int64),
                (base * 7 + 31 * t + f) % 101,      # per-pixel QA
            ]).astype(np.float32)
            payload = encode_image(arr, "raw")
            image_id = f"img_scene_{f:04d}_t{t}"
            img_rows.append({
                "image_id": image_id,
                "bytes": payload,
                "w": w, "h": h, "fmt": "raw",
                "caption": f"scene stack fp {f} epoch {t} seed {seed}",
                "phash": average_hash64(arr[0]),
                "affine_a": affine[0], "affine_b": affine[1],
                "affine_c": affine[2], "affine_d": affine[3],
                "affine_e": affine[4], "affine_f": affine[5],
                "crs": "EPSG:4326", "nodata": None, "bands": 4,
                "band_names": None,
            })
            meta_rows.append({
                "image_id": image_id,
                "footprint": f,
                "epoch": t,
                "scene_ts": 1_700_000_000 + 86_400 * t + f,
            })
    return pd.DataFrame(img_rows), pd.DataFrame(meta_rows)


def images_spark_df(spark, n_images: int, seed: int = 42, **kw):
    """Spark DataFrame of the synthetic table (small scales; driver-built).

    For bench scales use :func:`write_images_table`, which generates
    *distributed* (one seeded chunk per task — no driver bottleneck)."""
    return spark.createDataFrame(generate_images_pdf(n_images, seed, **kw), IMAGE_SCHEMA)


def write_images_table(spark, path: str, n_images: int, seed: int = 42,
                       chunk: int = 512, scenarios=SCENARIOS, size_range=(8, 48)):
    """Distributed deterministic generation → parquet at ``path``.

    Each task generates rows [start, end) with per-image seeds, so output
    content is independent of parallelism (determinism contract)."""
    starts = [(s, min(s + chunk, n_images)) for s in range(0, n_images, chunk)]
    rdd = spark.sparkContext.parallelize(starts, len(starts))

    def gen(rng_bounds):
        start, end = rng_bounds
        out = []
        for k in range(end - start):
            i = start + k
            rng = np.random.default_rng(np.random.SeedSequence([seed, i]))
            scenario = scenarios[i % len(scenarios)]
            if scenario == "geodesic2px":
                w, h = 1, 2
            else:
                w = int(rng.integers(size_range[0], size_range[1] + 1))
                h = int(rng.integers(size_range[0], size_range[1] + 1))
            arr, nodata, band_names = _pixels(scenario, rng, w, h)
            affine, crs = _georef(scenario, rng, w, h)
            fmt = ("raw", "zlib", "q8")[i % 3]
            if fmt == "q8" and (arr == _SENTINEL).any():
                fmt = "zlib"
            out.append((
                f"img_{scenario}_{i:08d}", encode_image(arr, fmt), w, h, fmt,
                f"{scenario} tile {i} of seed {seed}", int(average_hash64(arr[0])),
                float(affine[0]), float(affine[1]), float(affine[2]),
                float(affine[3]), float(affine[4]), float(affine[5]),
                crs, None if nodata is None else float(nodata), int(arr.shape[0]),
                band_names,
            ))
        return out

    df = spark.createDataFrame(rdd.flatMap(gen), IMAGE_SCHEMA)
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
