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
