"""Sample transfer kernels — analytic golden values + ownership/dedupe.

Mirrors the reference's sample tests (tests/classes/test_sample.py:
34-260): constant raster → every sampled cell is exactly the constant;
kernels agree at pixel centres; invalid-tap renormalization."""

import numpy as np
import pandas as pd
import pytest

from raster2dggs_spark.operators.sample import _stencil_sample, KERNELS


def test_stencil_constant_field():
    band = np.full((20, 30), 42.0)
    col_f = np.array([3.3, 10.0, 28.9, 0.0])
    row_f = np.array([2.7, 10.0, 18.2, 0.0])
    for kern in KERNELS:
        out = _stencil_sample(band, col_f, row_f, kern)
        np.testing.assert_allclose(out, 42.0, rtol=1e-9, err_msg=kern)


def test_stencil_exact_at_pixel_centers():
    rng = np.random.default_rng(3)
    band = rng.uniform(0, 100, (16, 16))
    ri, ci = np.mgrid[3:12, 3:12]
    col_f = ci.ravel().astype(float)
    row_f = ri.ravel().astype(float)
    for kern in KERNELS:
        out = _stencil_sample(band, col_f, row_f, kern)
        np.testing.assert_allclose(out, band[ri.ravel(), ci.ravel()],
                                   rtol=1e-9, err_msg=kern)


def test_bilinear_midpoint():
    band = np.zeros((4, 4))
    band[1, 1], band[1, 2], band[2, 1], band[2, 2] = 1.0, 3.0, 5.0, 7.0
    out = _stencil_sample(band, np.array([1.5]), np.array([1.5]), "bilinear")
    assert out[0] == pytest.approx(4.0)


def test_bilinear_renormalizes_over_valid():
    band = np.full((4, 4), 10.0)
    band[2, 2] = np.nan  # one invalid corner
    out = _stencil_sample(band, np.array([1.5]), np.array([1.5]), "bilinear")
    assert out[0] == pytest.approx(10.0)  # renorm over 3 valid corners
    band2 = np.full((4, 4), np.nan)
    band2[1, 1] = 10.0  # only 1 valid corner < min 2
    out2 = _stencil_sample(band2, np.array([1.5]), np.array([1.5]), "bilinear")
    assert np.isnan(out2[0])


def test_oob_is_nan_no_edge_repeat():
    band = np.full((4, 4), 5.0)
    out = _stencil_sample(band, np.array([-2.0]), np.array([1.0]), "nearest")
    assert np.isnan(out[0])
    # bilinear centred outside with only 1 in-bounds tap column -> 2 valid
    out2 = _stencil_sample(band, np.array([-0.4]), np.array([1.5]), "bilinear")
    assert out2[0] == pytest.approx(5.0)


def test_sample_cells_end_to_end(spark):
    from raster2dggs_spark.sources import images_spark_df
    from raster2dggs_spark.operators.sample import sample_cells
    from raster2dggs_spark.dggs import h3lib

    imgs = images_spark_df(spark, 6, seed=11, scenarios=("uniform42",),
                           size_range=(24, 32))
    out = sample_cells(imgs, res=7, kernel="bilinear").toPandas()
    assert len(out) > 0
    # constant field -> 42 everywhere (to renormalization round-off)
    np.testing.assert_allclose(out["band_1"].dropna().values, 42.0, rtol=1e-12)
    # no duplicate cells after ownership + dedupe
    assert out["cell"].is_unique
    assert (h3lib.get_resolution(out["cell"].values) == 7).all()


@pytest.mark.parametrize("kern", ["nearest", "bicubic", "lanczos"])
def test_sample_cells_kernels_run(spark, kern):
    from raster2dggs_spark.sources import images_spark_df
    from raster2dggs_spark.operators.sample import sample_cells

    imgs = images_spark_df(spark, 4, seed=12, scenarios=("temp_mean",),
                           size_range=(24, 32))
    out = sample_cells(imgs, res=7, kernel=kern).toPandas()
    assert len(out) > 0
    # smooth field: sampled values within the field's range
    v = out["band_1"].dropna()
    assert ((v > 0) & (v < 30)).all()


def test_sample_points_join_path_matches_collect(spark):
    """Round-2 verdict #2: the scale strategy (cell-routed join + cogroup
    kernel, NO driver collect of payloads) must equal the broadcast
    strategy bit-for-bit — points x 256 tiles, overlaps resolved by the
    same lowest-image_id rule, outside-all-tiles points NaN."""
    import pandas as pd

    from raster2dggs_spark.operators.sample import sample_points
    from raster2dggs_spark.sources.images import (
        IMAGE_SCHEMA, generate_images_pdf,
    )

    ipdf = generate_images_pdf(256, seed=11, size_range=(8, 14))
    imgs = spark.createDataFrame(ipdf, IMAGE_SCHEMA)
    # points: jittered around tile anchors (so most hit some tile, and
    # overlapping-tile ownership gets exercised), plus wide scatter and a
    # far-away point no tile covers (must come back NaN in both paths)
    rng = np.random.default_rng(3)
    n = 400
    anchors = ipdf.sample(n=n - 60, replace=True, random_state=7)
    near_lon = (anchors["affine_c"].values
                + rng.uniform(-0.3, 0.8, n - 60) * np.abs(
                    anchors["affine_a"].values * anchors["w"].values))
    near_lat = (anchors["affine_f"].values
                - rng.uniform(-0.3, 0.8, n - 60) * np.abs(
                    anchors["affine_e"].values * anchors["h"].values))
    # EPSG:3857 anchors produce out-of-range "lon/lat" — clip into range
    near_lon = np.clip(near_lon, -179.9, 179.9)
    near_lat = np.clip(near_lat, -85.0, 85.0)
    pts = pd.DataFrame({
        "point_id": np.arange(n, dtype=np.int64),
        "lon": np.concatenate([near_lon, rng.uniform(-170, 170, 59), [179.5]]),
        "lat": np.concatenate([near_lat, rng.uniform(-80, 80, 59), [-89.5]]),
    })
    pdf = spark.createDataFrame(pts)

    a = (sample_points(imgs, pdf, kernel="bilinear", strategy="collect",
                       force=True)
         .toPandas().sort_values("point_id").reset_index(drop=True))
    b = (sample_points(imgs, pdf, kernel="bilinear", strategy="join")
         .toPandas().sort_values("point_id").reset_index(drop=True))
    assert len(a) == len(b) == n
    for c in ("band_1", "band_2", "band_3", "band_4"):
        av, bv = a[c].values.astype(float), b[c].values.astype(float)
        assert (np.isnan(av) == np.isnan(bv)).all()
        m = ~np.isnan(av)
        assert np.array_equal(av[m], bv[m])
    # the far-away point is NaN in band_1 under both strategies
    assert np.isnan(b.loc[b.point_id == n - 1, "band_1"].iloc[0])
    # some points genuinely hit tiles (the comparison is not vacuous)
    assert (~a["band_1"].isna()).sum() > 50


def test_sample_points_auto_picks_join_for_big_tables(spark):
    """auto strategy must not collect a big image table to the driver."""
    from raster2dggs_spark.operators import sample as sample_mod
    from raster2dggs_spark.sources.images import (
        IMAGE_SCHEMA, generate_images_pdf,
    )
    import pandas as pd

    imgs = spark.createDataFrame(
        generate_images_pdf(80, seed=5, size_range=(8, 10)), IMAGE_SCHEMA
    )
    pts = spark.createDataFrame(pd.DataFrame({
        "point_id": [0, 1], "lon": [0.5, 3.0], "lat": [0.5, 3.0]
    }))
    called = {"join": False}
    orig = sample_mod._sample_points_join

    def spy(*a, **kw):
        called["join"] = True
        return orig(*a, **kw)

    sample_mod._sample_points_join = spy
    try:
        out = sample_mod.sample_points(imgs, pts, broadcast_threshold=64)
        out.collect()
    finally:
        sample_mod._sample_points_join = orig
    assert called["join"]


def test_sample_points_collect_refused_on_big_table(spark):
    """Forced strategy='collect' above the threshold must be refused
    unless force=True (the driver-OOM hard guard)."""
    from raster2dggs_spark.operators.sample import sample_points
    from raster2dggs_spark.sources.images import (
        IMAGE_SCHEMA, generate_images_pdf,
    )
    import pandas as pd

    imgs = spark.createDataFrame(
        generate_images_pdf(80, seed=5, size_range=(8, 10)), IMAGE_SCHEMA
    )
    pts = spark.createDataFrame(pd.DataFrame({
        "point_id": [0, 1], "lon": [0.5, 3.0], "lat": [0.5, 3.0]
    }))
    with pytest.raises(ValueError, match="force=True"):
        sample_points(imgs, pts, strategy="collect", broadcast_threshold=64)
    # the explicit override still works and returns every point row
    out = sample_points(imgs, pts, strategy="collect",
                        broadcast_threshold=64, force=True)
    assert out.count() == 2


def test_sample_antimeridian_tile(spark):
    """F14 for the sample transfer: a tile crossing ±180 must yield
    sampled cells on BOTH sides of the seam, and points expressed in the
    canonical frame must sample values from it (both strategies)."""
    import pandas as pd

    from raster2dggs_spark.codecs import average_hash64, encode_image
    from raster2dggs_spark.dggs import cover
    from raster2dggs_spark.operators.sample import sample_cells, sample_points
    from raster2dggs_spark.sources.images import IMAGE_SCHEMA

    w, h = 40, 24
    arr = np.arange(h * w, dtype=np.float32).reshape(1, h, w)
    tile = {
        "image_id": "am", "bytes": encode_image(arr, "raw"),
        "w": w, "h": h, "fmt": "raw", "caption": "am",
        "phash": int(average_hash64(arr[0])),
        "affine_a": 0.05, "affine_b": 0.0, "affine_c": 179.2,
        "affine_d": 0.0, "affine_e": -0.05, "affine_f": 5.0,
        "crs": "EPSG:4326", "nodata": None, "bands": 1,
        "band_names": None,
    }
    imgs = spark.createDataFrame(pd.DataFrame([tile]), IMAGE_SCHEMA)

    out = sample_cells(imgs, res=5, dggs="geohash", n_bands=1).toPandas()
    assert len(out) > 0
    clon, _ = cover.cell_center(out["cell"].values.astype(np.int64),
                                "geohash")
    assert clon.min() < -179.5 and clon.max() > 179.2  # both seam sides
    assert out["band_1"].notna().all()

    pts = spark.createDataFrame(pd.DataFrame({
        "point_id": [0, 1, 2],
        "lon": [179.5, -179.9, 0.0],   # first two inside the tile
        "lat": [4.9, 4.9, 4.9],
    }))
    for strat in ("collect", "join"):
        got = sample_points(imgs, pts, strategy=strat).toPandas() \
            .sort_values("point_id")
        assert np.isfinite(got["band_1"].values[:2]).all(), strat
        assert np.isnan(got["band_1"].values[2]), strat


def test_sample_cells_split_on_cap_identical(spark):
    """An extent too large for one covering pass must be SPLIT (exact
    half-open partition), never silently skipped: a run forced to split
    (tiny per-pass cap) returns cell-for-cell what the unsplit run
    returns."""
    from raster2dggs_spark.operators.sample import sample_cells
    from raster2dggs_spark.sources import images_spark_df

    imgs = images_spark_df(spark, 6, seed=21, size_range=(12, 18))
    big = sample_cells(imgs, res=6, kernel="bilinear").toPandas()
    forced = sample_cells(imgs, res=6, kernel="bilinear",
                          max_cells_per_tile=40).toPandas()
    key = ["cell"]
    a = big.sort_values(key).reset_index(drop=True)
    b = forced.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    pd.testing.assert_frame_equal(a, b)


def test_warp_grid_closed_form_and_outside_nan(spark):
    """warp_grid: bilinear warp of the linear ramp matches the closed
    form (inverse mercator + inverse affine), pixels outside every tile
    are NaN, and the join strategy agrees with collect."""
    import math

    import numpy as np
    import pandas as pd

    from raster2dggs_spark.codecs import encode_image, average_hash64
    from raster2dggs_spark.operators.sample import warp_grid
    from raster2dggs_spark.sources.images import IMAGE_SCHEMA

    w, h = 64, 48
    arr = np.arange(h * w, dtype=np.float32).reshape(1, h, w)
    imgs = spark.createDataFrame(pd.DataFrame([{
        "image_id": "ramp_00", "bytes": encode_image(arr, "raw"),
        "w": w, "h": h, "fmt": "raw", "caption": "ramp",
        "phash": int(average_hash64(arr[0])),
        "affine_a": 0.013, "affine_b": 0.0, "affine_c": 10.0037,
        "affine_d": 0.0, "affine_e": -0.013, "affine_f": 50.0041,
        "crs": "EPSG:4326", "nodata": None, "bands": 1,
        "band_names": None,
    }]), IMAGE_SCHEMA)
    R = 6378137.0

    def merc_y(lat):
        return R * math.log(math.tan(math.pi / 4 + math.radians(lat) / 2))

    # bbox deliberately pokes past the tile's west edge -> NaN column
    bbox = (math.radians(9.95) * R, merc_y(49.5),
            math.radians(10.4) * R, merc_y(49.9))
    out = warp_grid(imgs, bbox, 18, 16, "EPSG:3857",
                    strategy="collect").toPandas()
    assert len(out) == 18 * 16
    dx = (bbox[2] - bbox[0]) / 18
    dy = (bbox[3] - bbox[1]) / 16
    for r in out.itertuples():
        x = bbox[0] + (r.px + 0.5) * dx
        y = bbox[3] - (r.py + 0.5) * dy
        lon = math.degrees(x / R)
        lat = math.degrees(2 * math.atan(math.exp(y / R)) - math.pi / 2)
        col_f = (lon - 10.0037) / 0.013 - 0.5
        row_f = (50.0041 - lat) / 0.013 - 0.5
        if col_f < 0:  # west of the tile (outside; no clamp credit)
            assert np.isnan(r.band_1)
        elif col_f > 0.5:
            assert abs(r.band_1 - (row_f * 64 + col_f)) < 1e-6, r
    outside = out[out.lon < 10.0037 - 0.013]
    assert len(outside) > 0 and outside.band_1.isna().all()
    j = warp_grid(imgs, bbox, 18, 16, "EPSG:3857",
                  strategy="join").toPandas()
    a = out.sort_values(["px", "py"]).reset_index(drop=True)
    b = j.sort_values(["px", "py"]).reset_index(drop=True)
    assert np.allclose(a.band_1, b.band_1, equal_nan=True)
