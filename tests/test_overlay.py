"""Overlay transfer: conservation laws + analytic golden values, the
reference's strongest oracle style (test_output_schema.py:555-570
mass conservation; 940-1050 geodesic weighted means)."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def imgs(spark):
    from raster2dggs_spark.sources import images_spark_df

    df = images_spark_df(spark, 8, seed=21, scenarios=("gradient", "popcount"),
                         size_range=(16, 24))
    df.cache().count()
    return df


def test_mass_conservation_exact(spark, imgs):
    # Σ_cells mass == Σ_pixels value, to float round-off — the partition
    # property of supersampled coverage makes this exact by construction
    from raster2dggs_spark.operators.overlay import overlay_agg
    from raster2dggs_spark.sources import generate_images_pdf
    from raster2dggs_spark.codecs import decode_image

    out = overlay_agg(imgs, res=6, op="mass_sum")
    total = out.agg(F.sum("band_1")).collect()[0][0]
    pdf = generate_images_pdf(8, 21, scenarios=("gradient", "popcount"),
                              size_range=(16, 24))
    expected = sum(
        float(np.nansum(decode_image(b)[0], dtype=np.float64)) for b in pdf["bytes"]
    )
    assert total == pytest.approx(expected, rel=1e-9)


def test_weighted_mean_constant_field(spark):
    # constant raster -> weighted mean is exactly the constant in every cell
    from raster2dggs_spark.sources import images_spark_df
    from raster2dggs_spark.operators.overlay import overlay_agg

    imgs = images_spark_df(spark, 4, seed=22, scenarios=("uniform42",),
                           size_range=(12, 16))
    out = overlay_agg(imgs, res=6, op="weighted_mean").toPandas()
    assert len(out) > 0
    np.testing.assert_allclose(out["band_1"].dropna().values, 42.0, rtol=1e-9)


def test_weighted_sum_equals_area_for_unit_field(spark):
    # value≡1 -> weighted_sum per cell == covered geodesic area; total over
    # cells == total raster area (authalic band formula golden value)
    from raster2dggs_spark.sources import images_spark_df, generate_images_pdf
    from raster2dggs_spark.operators.overlay import overlay_agg
    from raster2dggs_spark.codecs import decode_image
    from raster2dggs_spark.geo import geodesic_row_areas_m2

    imgs = images_spark_df(spark, 3, seed=23, scenarios=("uniform42",),
                           size_range=(10, 12))
    out = overlay_agg(imgs, res=5, op="weighted_sum")
    total = out.agg(F.sum("band_1")).collect()[0][0] / 42.0
    pdf = generate_images_pdf(3, 23, scenarios=("uniform42",), size_range=(10, 12))
    exp = 0.0
    for _, r in pdf.iterrows():
        arr = decode_image(r["bytes"])[0]
        h, w = arr.shape
        aff = (r["affine_a"], r["affine_b"], r["affine_c"],
               r["affine_d"], r["affine_e"], r["affine_f"])
        areas = np.repeat(geodesic_row_areas_m2(aff, w, h, r["crs"]), w)
        valid = np.isfinite(np.where(arr == -9999.0, np.nan, arr)).ravel()
        exp += float(areas[valid].sum())
    assert total == pytest.approx(exp, rel=1e-6)


def test_fractions_sum_to_one(spark):
    from raster2dggs_spark.sources import images_spark_df
    from raster2dggs_spark.operators.overlay import overlay_classes

    imgs = images_spark_df(spark, 4, seed=24, scenarios=("landcover",),
                           size_range=(16, 20))
    out = overlay_classes(imgs, res=6, op="fractions").toPandas()
    assert len(out) > 0
    sums = out.groupby(["parent", "cell"])["fraction"].sum()
    np.testing.assert_allclose(sums.values, 1.0, rtol=1e-9)
    assert ((out["fraction"] > 0) & (out["fraction"] <= 1 + 1e-12)).all()
    assert out["class"].isin([1, 2, 3, 4, 5, 6]).all()


def test_overlay_mode_majority_class(spark):
    from raster2dggs_spark.sources import images_spark_df
    from raster2dggs_spark.operators.overlay import overlay_classes

    imgs = images_spark_df(spark, 4, seed=24, scenarios=("landcover",),
                           size_range=(16, 20))
    frac = overlay_classes(imgs, res=6, op="fractions").toPandas()
    mode = overlay_classes(imgs, res=6, op="mode").toPandas()
    # mode == class with the max fraction (ties -> lowest class)
    top = (
        frac.sort_values(["parent", "cell", "fraction", "class"],
                         ascending=[True, True, False, True])
        .groupby(["parent", "cell"]).first()["class"]
    )
    got = mode.set_index(["parent", "cell"])["majority_class"]
    assert got.sort_index().equals(top.sort_index())


def test_vct_nulls_low_coverage(spark):
    from raster2dggs_spark.sources import images_spark_df
    from raster2dggs_spark.operators.overlay import overlay_agg

    imgs = images_spark_df(spark, 4, seed=25, scenarios=("multiband_nodata",),
                           size_range=(16, 20))
    strict = overlay_agg(imgs, res=6, op="weighted_mean", vct=0.99).toPandas()
    loose = overlay_agg(imgs, res=6, op="weighted_mean", vct=0.0).toPandas()
    # strict VCT nulls at least as many values as loose
    assert strict["band_1"].isna().sum() >= loose["band_1"].isna().sum()
    assert strict["band_1"].isna().sum() > 0  # 15% nodata per band -> some cut


def test_overlay_list_sorted_and_complete(spark):
    """--overlay list: per-cell lists are ascending and contain exactly
    one entry per intersecting valid (cell, pixel) pair."""
    from raster2dggs_spark.operators.overlay import overlay_list, overlay_values
    from raster2dggs_spark.sources import images_spark_df

    imgs = images_spark_df(spark, 6, seed=30, scenarios=("landcover",),
                           size_range=(10, 14))
    ex = overlay_values(imgs, res=6, parent_res=0).toPandas()
    out = overlay_list(imgs, res=6, parent_res=0).toPandas()
    assert out["values"].map(len).sum() == len(ex)
    for v in out["values"]:
        lst = list(v)
        assert lst == sorted(lst) and len(lst) >= 1


def test_overlay_list_multi_matches_per_band_single(spark):
    """Multi-band OVERLAY_COLLECT (one decode pass) must produce, per
    band, exactly the list the single-band operator produces — with
    per-band nodata holes at different pixels, so lengths differ."""
    from raster2dggs_spark.operators.overlay import (
        overlay_list, overlay_list_multi,
    )
    from raster2dggs_spark.sources import images_spark_df

    imgs = images_spark_df(spark, 6, seed=30, scenarios=("multiband_nodata",),
                           size_range=(10, 14))
    multi = overlay_list_multi(imgs, res=6, parent_res=0,
                               bands=(1, 3)).toPandas()
    multi = multi.set_index(["parent", "cell"]).sort_index()
    assert set(multi.columns) == {"values_b1", "values_b3"}
    for b in (1, 3):
        single = overlay_list(imgs, res=6, parent_res=0, band=b).toPandas()
        single = single.set_index(["parent", "cell"]).sort_index()
        got = multi[f"values_b{b}"].map(lambda v: tuple(v))
        # single-band emits no row for cells where band b has no valid
        # pixel; multi emits an empty list there
        got_nonempty = got[got.map(len) > 0]
        exp = single["values"].map(lambda v: tuple(v))
        assert got_nonempty.sort_index().equals(exp.sort_index())
    # different nodata holes -> at least one cell with differing lengths
    diff = (multi["values_b1"].map(len) != multi["values_b3"].map(len))
    assert diff.any()


def test_api_overlay_list_multiband_route(spark):
    """index_raster(transfer='overlay', op='list', band=[1,2]) routes
    through the one-pass multi-band operator."""
    from raster2dggs_spark.api import index_raster
    from raster2dggs_spark.sources import images_spark_df

    imgs = images_spark_df(spark, 4, seed=30, scenarios=("multiband_nodata",),
                           size_range=(10, 12))
    out = index_raster(imgs, resolution=6, transfer="overlay", op="list",
                       band=[1, 2], raw_ids=True)
    cols = set(out.columns)
    assert "values_b1" in cols and "values_b2" in cols
    assert out.count() > 0


def test_overlay_mass_conservation_grid_independent(spark):
    """The overlay machinery is grid-generic: mass_sum conserves the
    raster total EXACTLY and identically on every grid (the
    coverage-fraction partition sums to 1 per pixel regardless of the
    cell lattice) — pinned on the round-5 grids vs hex7."""
    import pyspark.sql.functions as F

    from raster2dggs_spark.operators.overlay import overlay_agg
    from raster2dggs_spark.sources import images_spark_df

    imgs = images_spark_df(spark, 8, seed=42, size_range=(10, 14))
    masses = {}
    for dggs, res in (("hex7", 7), ("a5", 8), ("i4r", 9)):
        out = overlay_agg(imgs, res=res, op="mass_sum", dggs=dggs,
                          n_bands=4)
        r = out.agg(F.sum("band_1").alias("m")).collect()[0]
        masses[dggs] = r["m"]
    import numpy as np
    vals = list(masses.values())
    assert np.allclose(vals, vals[0], rtol=1e-9), masses
