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
