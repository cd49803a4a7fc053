"""End-to-end pixel→cell pipeline tests on local Spark.

Mirrors the reference's stage-1 row-count contract ("exactly one row per
kept pixel", /root/reference/tests/regression/test_stage1_row_count.py:
58-98), uniform-value exactness (tests/classes/helpers.py:7-34 fixtures)
and mass conservation (test_output_schema.py:555-570)."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def imgs(spark):
    from raster2dggs_spark.sources import images_spark_df

    df = images_spark_df(spark, 24, seed=42)
    df.cache().count()
    return df


def _decode_all(n=24, seed=42):
    """Ground truth decode with the engine's nodata semantics applied
    (sentinel values masked to NaN)."""
    from raster2dggs_spark.sources import generate_images_pdf
    from raster2dggs_spark.codecs import decode_image

    pdf = generate_images_pdf(n, seed)
    arrays = []
    for b, nd in zip(pdf["bytes"], pdf["nodata"]):
        arr = decode_image(b)
        if nd is not None and not (isinstance(nd, float) and np.isnan(nd)):
            arr = np.where(arr == np.float32(nd), np.nan, arr)
        arrays.append(arr)
    return pdf, arrays


def test_stage1_row_count_contract(spark, imgs):
    # omit policy: exactly one row per pixel that is valid in >=1 band
    from raster2dggs_spark.operators.indexing import pixel_cells

    pdf, arrays = _decode_all()
    expected = 0
    for arr in arrays:
        vals = arr.reshape(arr.shape[0], -1)
        expected += int((~np.all(np.isnan(vals), axis=0)).sum())
    got = pixel_cells(imgs, res=9).count()
    assert got == expected


def test_emit_policy_keeps_all_pixels(spark, imgs):
    from raster2dggs_spark.operators.indexing import pixel_cells

    pdf, arrays = _decode_all()
    total = sum(a.shape[1] * a.shape[2] for a in arrays)
    got = pixel_cells(imgs, res=9, nodata_policy="emit", nodata_fill=0.0).count()
    assert got == total


def test_uniform_value_exact(spark):
    # uniform42 tiles: every aggregated cell mean is exactly 42
    from raster2dggs_spark.sources import images_spark_df
    from raster2dggs_spark.operators.indexing import index_point_agg

    imgs = images_spark_df(spark, 8, seed=7, scenarios=("uniform42",))
    out = index_point_agg(imgs, res=8, agg="mean").toPandas()
    assert len(out) > 0
    vals = out["band_1"].dropna().unique()
    np.testing.assert_allclose(vals, [42.0])


def test_mass_conservation(spark):
    # sum over cells of (per-cell sum) == sum of all valid pixels
    from raster2dggs_spark.sources import images_spark_df, generate_images_pdf
    from raster2dggs_spark.codecs import decode_image
    from raster2dggs_spark.operators.indexing import index_point_agg

    imgs = images_spark_df(spark, 16, seed=3, scenarios=("gradient", "popcount"))
    out = index_point_agg(imgs, res=9, agg="sum")
    total = out.agg(F.sum("band_1")).collect()[0][0]
    pdf = generate_images_pdf(16, 3, scenarios=("gradient", "popcount"))
    expected = sum(
        float(np.nansum(decode_image(b)[0], dtype=np.float64)) for b in pdf["bytes"]
    )
    assert total == pytest.approx(expected, rel=1e-9)


def test_parent_prefix_invariant(spark, imgs):
    # parent column == cell_to_parent(cell) for every row
    from raster2dggs_spark.operators.indexing import pixel_cells
    from raster2dggs_spark.dggs import h3lib

    rows = pixel_cells(imgs, res=9, parent_res=4).select("parent", "cell").toPandas()
    np.testing.assert_array_equal(
        rows["parent"].values,
        h3lib.cell_to_parent(rows["cell"].values, 4),
    )


def test_band_selection_and_fixed_schema(spark, imgs):
    from raster2dggs_spark.operators.indexing import pixel_cells

    df = pixel_cells(imgs, res=7, bands=[2], n_bands=1)
    assert df.columns == ["image_id", "parent", "cell", "band_1"]
    # multiband images have band 2; single-band images contribute nulls
    pdf = df.toPandas()
    assert len(pdf) > 0


def test_caption_phash_integrity(spark):
    # input_hint: caption + phash carried through and decodable payloads
    # PSNR >= 40 dB for lossy fmt
    from raster2dggs_spark.sources import generate_images_pdf, images_spark_df
    from raster2dggs_spark.codecs import decode_image, psnr_db, average_hash64

    pdf = generate_images_pdf(24, seed=42)
    sdf = images_spark_df(spark, 24, seed=42).select("image_id", "caption", "phash", "bytes", "fmt")
    back = sdf.toPandas().set_index("image_id")
    for _, row in pdf.iterrows():
        got = back.loc[row["image_id"]]
        assert got["caption"] == row["caption"]
        assert got["phash"] == row["phash"]
        arr = decode_image(bytes(got["bytes"]))
        assert average_hash64(arr[0]) == row["phash"] or got["fmt"] == "q8"
        if got["fmt"] == "q8":
            ref = decode_image(bytes(row["bytes"]))
            assert psnr_db(ref, arr) >= 40.0


def test_s2_pipeline(spark, imgs):
    from raster2dggs_spark.operators.indexing import index_point_agg
    from raster2dggs_spark.dggs import s2lib

    out = index_point_agg(imgs, res=12, dggs="s2", agg="count").toPandas()
    assert len(out) > 0
    assert (s2lib.cell_level(out["cell"].values) == 12).all()
    assert (s2lib.cell_level(out["parent"].values) == 4).all()
    assert s2lib.contains(out["parent"].values, out["cell"].values).all()


def test_reference_output_format(spark, imgs):
    from raster2dggs_spark.operators.indexing import index_point_agg, to_reference_output

    out = to_reference_output(index_point_agg(imgs, res=9, agg="mean"), "hex7", 9, 3)
    assert "hex7_09" in out.columns and "hex7_03" in out.columns
    row = out.select("hex7_09").first()
    int(row[0], 16)  # parses as hex


def test_h3_grid_key_rejected(spark):
    """Output contract: the hexagonal grid is 'hex7'; the 'h3' key is
    rejected loudly (ids are not libh3-interoperable)."""
    import pytest as _pytest

    from raster2dggs_spark.dggs import check_grid
    from raster2dggs_spark.operators.indexing import to_reference_output

    with _pytest.raises(ValueError, match="hex7"):
        check_grid("h3")
    from raster2dggs_spark.sources import images_spark_df
    from raster2dggs_spark.operators.indexing import index_point_agg

    imgs = images_spark_df(spark, 2, seed=42)
    with _pytest.raises(ValueError, match="hex7"):
        index_point_agg(imgs, res=5, dggs="h3")
