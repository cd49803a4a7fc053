"""Maidenhead locator: known vectors + invariants + pipeline."""

import numpy as np

from raster2dggs_spark.dggs import maidenheadlib as mh


def test_known_vectors():
    # Greenwich -> IO91; Wellington NZ -> RE78 (published grid)
    c = mh.lonlat_to_cell(np.array([-0.0005]), np.array([51.4769]), 2)
    assert mh.cells_to_string(c)[0] == "IO91"
    c2 = mh.lonlat_to_cell(np.array([174.77]), np.array([-41.28]), 2)
    assert mh.cells_to_string(c2)[0] == "RE78"
    back = mh.strings_to_cells(["IO91", "RE78"])
    assert mh.cells_to_string(back) == ["IO91", "RE78"]


def test_roundtrip_and_prefix_parent():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 20000)
    lat = rng.uniform(-90, 90, 20000)
    for p in (1, 2, 3, 5):
        cc = mh.lonlat_to_cell(lon, lat, p)
        assert (mh.get_precision(cc) == p).all()
        clon, clat = mh.cell_to_lonlat(cc)
        assert (mh.lonlat_to_cell(clon, clat, p) == cc).all()
        back = mh.strings_to_cells(mh.cells_to_string(cc[:100]))
        assert (back == cc[:100]).all()
        if p > 1:
            par = mh.cell_to_parent(cc, p - 1)
            s_full = mh.cells_to_string(cc[:50])
            s_par = mh.cells_to_string(par[:50])
            assert all(f.startswith(q) for f, q in zip(s_full, s_par))


def test_field_partition():
    # precision 1: 18*18 fields partition the globe
    rng = np.random.default_rng(4)
    lon = rng.uniform(-180, 180, 100000)
    lat = rng.uniform(-90, 90, 100000)
    c = mh.lonlat_to_cell(lon, lat, 1)
    assert len(np.unique(c)) == 18 * 18
