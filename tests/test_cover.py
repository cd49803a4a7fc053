"""Grid-generic cells_in_bbox (dggs.cover): soundness (every returned
center strictly inside) and completeness (every cell containing a random
in-bbox point whose center is in the bbox is returned) on all 5 grids."""

import numpy as np
import pytest

from raster2dggs_spark.dggs import cover

GRIDS_RES = [("hex7", 6), ("s2", 11), ("geohash", 4), ("maidenhead", 3),
             ("rhp", 6)]

BBOX = (12.3, 41.2, 14.1, 42.6)  # ~1.8 x 1.4 degrees


@pytest.mark.parametrize("dggs,res", GRIDS_RES)
def test_cover_bbox_sound_and_complete(dggs, res):
    lon_min, lat_min, lon_max, lat_max = BBOX
    cells = cover.cover_bbox(lon_min, lat_min, lon_max, lat_max, res, dggs)
    assert cells.size > 20
    assert np.unique(cells).size == cells.size
    clon, clat = cover.cell_center(cells, dggs)
    assert ((clon >= lon_min) & (clon < lon_max)).all()
    assert ((clat >= lat_min) & (clat < lat_max)).all()
    # completeness: encode random interior points; any whose cell center
    # is inside the bbox must appear in the cover
    rng = np.random.default_rng(3)
    plon = rng.uniform(lon_min, lon_max, 3000)
    plat = rng.uniform(lat_min, lat_max, 3000)
    pcells = np.unique(cover.encode(plon, plat, res, dggs))
    pclon, pclat = cover.cell_center(pcells, dggs)
    inside = ((pclon >= lon_min) & (pclon < lon_max)
              & (pclat >= lat_min) & (pclat < lat_max))
    missing = set(pcells[inside].tolist()) - set(cells.tolist())
    assert not missing, f"{dggs}: {len(missing)} center-inside cells missed"


@pytest.mark.parametrize("dggs,res", [("hex7", 5), ("s2", 9), ("rhp", 4)])
def test_cover_bbox_antimeridian(dggs, res):
    """Unwrapped-frame bbox across +-180 (reference F14 semantics)."""
    cells = cover.cover_bbox(178.5, -20.0, 181.5, -18.0, res, dggs)
    assert cells.size > 3
    clon, clat = cover.cell_center(cells, dggs)
    clon = clon + 360.0 * np.round((180.0 - clon) / 360.0)
    assert ((clon >= 178.5) & (clon < 181.5)).all()
    assert ((clat >= -20.0) & (clat < -18.0)).all()


def test_sample_cells_s2(spark):
    """Sample transfer runs on S2: values come from the right tiles
    (nearest kernel at a constant tile reproduces the constant)."""
    from raster2dggs_spark.sources import images_spark_df
    from raster2dggs_spark.operators.sample import sample_cells

    imgs = images_spark_df(spark, 8, seed=42, scenarios=("uniform42",),
                           size_range=(12, 20))
    out = sample_cells(imgs, res=10, kernel="nearest", dggs="s2").toPandas()
    assert len(out) > 0
    vals = out["band_1"].dropna().unique()
    assert set(np.round(vals, 6)) <= {42.0, -9999.0}


def test_cover_bbox_wide_lat_no_skipped_columns():
    """Regression: scaling the lon sampling step by 1/cos(EXTREME bbox
    lat) skipped whole cell columns near the equatorial side of a
    wide-latitude bbox (geohash res 1: a 90-deg-tall bbox lost the cell
    containing an interior point).  Every interior probe point's cell
    must be in the cover, for every grid."""
    import numpy as np

    from raster2dggs_spark.dggs import cover

    rng = np.random.default_rng(5)
    cases = [
        ("geohash", 1), ("geohash", 2), ("maidenhead", 1),
        ("s2", 3), ("rhp", 2), ("hex7", 1),
    ]
    lon_min, lon_max = -102.23, -10.72
    lat_min, lat_max = -59.02, 32.50
    for dggs, res in cases:
        cells = set(cover.cover_bbox(
            lon_min, lat_min, lon_max, lat_max, res, dggs=dggs
        ).tolist())
        plon = rng.uniform(lon_min + 0.5, lon_max - 0.5, 300)
        plat = rng.uniform(lat_min + 0.5, lat_max - 0.5, 300)
        pc = cover.encode(plon, plat, res, dggs)
        clon, clat = cover.cell_center(pc, dggs)
        inside = ((clon >= lon_min) & (clon < lon_max)
                  & (clat >= lat_min) & (clat < lat_max))
        missing = set(pc[inside].tolist()) - cells
        assert not missing, f"{dggs} res {res}: cover missed {missing}"


def test_encode_wraps_longitudes_every_grid():
    """F14: lons outside [-180, 180) must encode to the same cell as
    their canonical equivalent on EVERY grid (the flat grids used to
    CLAMP 181.3 into the last cell column; curved grids are only
    periodic within one turn)."""
    import numpy as np

    from raster2dggs_spark.dggs import cover

    for dggs, res in [("hex7", 7), ("s2", 12), ("geohash", 6),
                      ("maidenhead", 3), ("rhp", 6)]:
        lon = np.array([181.3, -178.7, 541.3, -180.0, 180.0])
        lat = np.full(5, 10.0)
        c = cover.encode(lon, lat, res, dggs)
        assert c[0] == c[1] == c[2], f"{dggs}: wrap mismatch {c[:3]}"
        assert c[3] == c[4], f"{dggs}: ±180 seam mismatch {c[3:]}"


def test_index_point_antimeridian_tile(spark):
    """A tile whose pixels straddle ±180 must index to the same cells as
    the identical tile expressed in the wrapped frame."""
    import numpy as np
    import pandas as pd

    from raster2dggs_spark.codecs import encode_image, average_hash64
    from raster2dggs_spark.operators.indexing import index_point_agg
    from raster2dggs_spark.sources.images import IMAGE_SCHEMA

    def tile(image_id, c_lon):
        w, h = 20, 12
        arr = np.arange(h * w, dtype=np.float32).reshape(1, h, w)
        return {
            "image_id": image_id, "bytes": encode_image(arr, "raw"),
            "w": w, "h": h, "fmt": "raw", "caption": "am",
            "phash": int(average_hash64(arr[0])),
            "affine_a": 0.05, "affine_b": 0.0, "affine_c": c_lon,
            "affine_d": 0.0, "affine_e": -0.05, "affine_f": 5.0,
            "crs": "EPSG:4326", "nodata": None, "bands": 1,
            "band_names": None,
        }

    for dggs, res in [("geohash", 5), ("hex7", 6)]:
        # tile from 179.5 unwrapped (lons run to 180.5)
        a = spark.createDataFrame(pd.DataFrame([tile("t", 179.5)]),
                                  IMAGE_SCHEMA)
        got = index_point_agg(a, res=res, dggs=dggs, agg="mean",
                              n_bands=1).toPandas()
        # split into the two canonical halves: [179.5,180) and [-180,-179.5)
        cells = set(got["cell"])
        from raster2dggs_spark.dggs import cover

        lons = 179.5 + 0.05 * (np.arange(20) + 0.5)
        lats = 5.0 - 0.05 * (np.arange(12) + 0.5)
        glon = np.tile(lons, 12)
        glat = np.repeat(lats, 20)
        exp = set(cover.encode(glon, glat, res, dggs).tolist())
        assert cells == exp, f"{dggs}: {len(cells)} vs {len(exp)}"
        # both sides of the seam are present
        clon, _ = cover.cell_center(np.array(sorted(cells)), dggs)
        assert clon.min() < -179 and clon.max() > 179
