"""Viewshed (operators/terrain.py viewshed / viewshed_cells).

Kernel pinned against a Fraction-exact brute-force R3 reference
(rational sightline positions, exact bilinear, grazing ties visible);
the Spark
plan pinned against the kernel run single-node.
"""

import numpy as np
import pytest
from fractions import Fraction

from raster2dggs_spark.operators.terrain import viewshed, viewshed_cells


def _brute(z, obs, hgt=0):
    h, w = z.shape
    orr, oc = obs
    zi = [[Fraction(int(z[r, c])) for c in range(w)] for r in range(h)]
    zo = zi[orr][oc] + Fraction(int(hgt))
    vis = np.ones((h, w), bool)
    for r in range(h):
        for c in range(w):
            d = max(abs(r - orr), abs(c - oc))
            if d <= 1:
                continue
            tant = (zi[r][c] - zo) / d
            for k in range(1, d):
                py = Fraction(orr * d + k * (r - orr), d)
                px = Fraction(oc * d + k * (c - oc), d)
                fy, fx = int(py), int(px)
                ry, rx = py - fy, px - fx
                fy1, fx1 = min(fy + 1, h - 1), min(fx + 1, w - 1)
                zk = (zi[fy][fx] * (1 - ry) * (1 - rx)
                      + zi[fy][fx1] * (1 - ry) * rx
                      + zi[fy1][fx] * ry * (1 - rx)
                      + zi[fy1][fx1] * ry * rx)
                if (zk - zo) / k > tant:
                    vis[r, c] = False
                    break
    return vis


def test_kernel_fuzz_vs_rational_brute_force():
    rng = np.random.default_rng(5)
    for _ in range(30):
        h = int(rng.integers(2, 16))
        w = int(rng.integers(2, 16))
        z = rng.integers(0, 30, (h, w)).astype(np.float32)
        obs = (int(rng.integers(0, h)), int(rng.integers(0, w)))
        hgt = int(rng.integers(0, 4))
        assert (viewshed(z, obs, hgt) == _brute(z, obs, hgt)).all()


def test_flat_terrain_all_visible_wall_blocks():
    z = np.zeros((9, 9), np.float32)
    assert viewshed(z, (4, 4)).all()
    z[4, 6] = 5                     # wall east of the observer
    vis = viewshed(z, (4, 4))
    assert vis[4, 6]                # the wall itself is visible
    assert not vis[4, 7] and not vis[4, 8]   # its shadow is not
    assert vis[4, :6].all()         # the other side is unaffected


def test_grazing_tie_visible():
    # constant upward ramp east: every cell subtends EXACTLY the
    # tangent of the one before it -> grazing, all visible; raising
    # one intermediate by 1 strictly blocks everything behind it
    z = np.array([[0, 1, 2, 3, 4]], np.float32)
    assert viewshed(z, (0, 0)).all()
    z[0, 2] = 3
    vis = viewshed(z, (0, 0))
    assert list(vis[0]) == [True, True, True, False, False]


def test_nan_transparent_and_dropped():
    z = np.zeros((5, 5), np.float32)
    z[2, 2] = np.nan                # hole between observer and east rim
    vis = viewshed(z, (2, 0))
    assert vis[2, 4]                # NaN never blocks
    assert not vis[2, 2]            # NaN target is not visible


def test_observer_out_of_tile_raises():
    with pytest.raises(ValueError, match="observer"):
        viewshed(np.zeros((4, 4), np.float32), (9, 0))


def test_spark_plan_matches_kernel(spark):
    from raster2dggs_spark.sources.images import (
        IMAGE_SCHEMA, generate_basin_images_pdf,
    )

    pdf = generate_basin_images_pdf(6)
    imgs = spark.createDataFrame(pdf, IMAGE_SCHEMA)
    out = (viewshed_cells(imgs, observer=(2, 3), obs_height=2, res=7,
                          keep_image_id=True, keep_pixel=True)
           .toPandas())
    for i in range(6):
        w = 12 + (i * 5) % 7
        h = 12 + (i * 3) % 7
        s = 1 + i % 3
        r_idx, c_idx = np.meshgrid(np.arange(h), np.arange(w),
                                   indexing="ij")
        z = (((3 * r_idx * r_idx + 5 * c_idx * c_idx
               + 7 * r_idx * c_idx + i) % 31) * s).astype(np.float32)
        want = viewshed(z, (2, 3), 2)
        got = out[out.image_id == f"img_basin_{i:08d}"]
        assert len(got) == h * w
        m = np.zeros((h, w), bool)
        m[got.pr.to_numpy(), got.pc.to_numpy()] = got.visible.to_numpy()
        assert (m == want).all()


def test_geographic_crs_rejected(spark):
    from raster2dggs_spark.sources.images import (
        IMAGE_SCHEMA, generate_basin_images_pdf,
    )

    pdf = generate_basin_images_pdf(1)
    pdf["crs"] = "EPSG:4326"
    imgs = spark.createDataFrame(pdf, IMAGE_SCHEMA)
    with pytest.raises(Exception, match="latitude-distortion"):
        viewshed_cells(imgs, observer=(2, 3), keep_pixel=True).collect()
