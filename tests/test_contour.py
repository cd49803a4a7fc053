"""contour_segments — marching squares pinned by closed-form fixtures
and a loop-closure property on random surfaces."""

import numpy as np
import pandas as pd
import pytest

from raster2dggs_spark.operators.vector import (
    contour_segments, marching_squares,
)


def _segset(x0, y0, x1, y1, nd=9):
    return {(round(a, nd), round(b, nd), round(c, nd), round(d, nd))
            for a, b, c, d in zip(x0, y0, x1, y1)}


def test_ramp_vertical_line():
    # z = x, level 2.25 -> vertical segments at x = 2.25, one per row
    h, w = 5, 6
    z = np.tile(np.arange(w, dtype=float), (h, 1))
    x0, y0, x1, y1 = marching_squares(z, 2.25)
    got = _segset(x0, y0, x1, y1)
    exp = {(2.25, float(r), 2.25, float(r + 1)) for r in range(h - 1)}
    assert got == exp


def test_saddle_center_connected():
    z = np.array([[1.0, 0.0], [0.0, 1.0]])
    x0, y0, x1, y1 = marching_squares(z, 0.5)  # center mean = 0.5 >= L
    got = _segset(x0, y0, x1, y1)
    assert got == {(0.5, 0.0, 1.0, 0.5), (0.0, 0.5, 0.5, 1.0)}


def test_saddle_center_disconnected():
    z = np.array([[1.0, 0.0], [0.0, 0.9]])
    x0, y0, x1, y1 = marching_squares(z, 0.5)  # center 0.475 < L
    got = _segset(x0, y0, x1, y1)
    t = 0.5 / 0.9
    assert got == {(0.0, 0.5, 0.5, 0.0),
                   (round(t, 9), 1.0, 1.0, round(t, 9))}


def test_nan_square_emits_nothing():
    z = np.array([[1.0, np.nan], [0.0, 1.0]])
    x0, _, _, _ = marching_squares(z, 0.5)
    assert len(x0) == 0


def test_pyramid_contour_closes_and_length():
    # z = 10 - chebyshev distance from center -> square ring contours
    n = 21
    yy, xx = np.indices((n, n), dtype=float)
    z = 10.0 - np.maximum(np.abs(xx - 10), np.abs(yy - 10))
    x0, y0, x1, y1 = marching_squares(z, 6.5)
    # ring at chebyshev radius 3.5: an octagon-cornered square of side 7
    total = np.hypot(x1 - x0, y1 - y0).sum()
    # perimeter of the square |x-10|max = 3.5 ring: 4 * 7 = 28 (the
    # marching-squares ring cuts corners by 45-degree chamfers of the
    # half-pixel: 4 corners replace 2*0.5 L1 with sqrt(0.5))
    assert abs(total - (4 * 7 - 8 * 0.5 + 4 * np.sqrt(0.5))) < 1e-9
    # closure: every endpoint appears exactly twice
    pts = {}
    for a, b in [(p, q) for p, q in zip(zip(x0, y0), zip(x1, y1))]:
        for p in (a, b):
            k = (round(p[0], 9), round(p[1], 9))
            pts[k] = pts.get(k, 0) + 1
    assert all(v == 2 for v in pts.values())


def test_random_interior_contours_close():
    rng = np.random.RandomState(5)
    z = rng.randint(0, 10, (16, 16)).astype(float)
    # pad the border below every level so no contour exits the grid
    z[0, :] = z[-1, :] = z[:, 0] = z[:, -1] = -5.0
    for lv in (0.5, 4.5, 8.5):
        x0, y0, x1, y1 = marching_squares(z, lv)
        pts = {}
        for p in list(zip(x0, y0)) + list(zip(x1, y1)):
            k = (round(p[0], 9), round(p[1], 9))
            pts[k] = pts.get(k, 0) + 1
        assert pts and all(v % 2 == 0 for v in pts.values())


def test_contour_segments_grouped(spark):
    rows = []
    for img in ("a", "b"):
        off = 0.0 if img == "a" else 3.0
        for y in range(4):
            for x in range(5):
                rows.append((img, x, y, float(x) + off))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["img", "x", "y", "z"]))
    out = contour_segments(df, levels=[2.25], group_cols=["img"])
    got = {(r.img, r.x0, r.y0, r.x1, r.y1) for r in out.collect()}
    exp = set()
    for r in range(3):
        exp.add(("a", 2.25, float(r), 2.25, float(r + 1)))
    # img b: z = x + 3 crosses 2.25 at x = -0.75 (outside) -> no segs
    assert got == exp
    assert out.columns == ["img", "level", "x0", "y0", "x1", "y1"]


def test_contour_sparse_holes(spark):
    # missing lattice rows kill the squares that touch them
    rows = [("i", x, y, float(x)) for x in range(4) for y in range(3)
            if not (x == 1 and y == 0)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["img", "x", "y", "z"]))
    out = contour_segments(df, levels=[1.5], group_cols=["img"])
    got = {(r.x0, r.y0, r.x1, r.y1) for r in out.collect()}
    # the hole at (1,0) kills row-0 squares that touch it; only the
    # square column between y=1 and y=2 still carries the crossing
    assert got == {(1.5, 1.0, 1.5, 2.0)}


def test_contour_empty_levels_raise(spark):
    df = spark.createDataFrame(pd.DataFrame(
        {"x": [0], "y": [0], "z": [1.0]}))
    with pytest.raises(ValueError, match="levels"):
        contour_segments(df, levels=[])


def test_stitch_ring_and_chain(spark):
    from raster2dggs_spark.operators.vector import stitch_segments

    # a closed unit square ring + an open 2-segment chain, two groups
    ring = [(0.0, 0.0, 1.0, 0.0), (1.0, 0.0, 1.0, 1.0),
            (0.0, 1.0, 1.0, 1.0), (0.0, 0.0, 0.0, 1.0)]
    chain = [(5.0, 5.0, 6.0, 5.0), (6.0, 5.0, 7.0, 6.0)]
    rows = ([("g1", *s) for s in ring + chain]
            + [("g2", *s) for s in ring])
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["g", "x0", "y0", "x1", "y1"]))
    out = {(r.g, r.anchor_x, r.anchor_y): (r.n_segs, r.n_vertices,
                                           round(r.length, 9), r.closed)
           for r in stitch_segments(df, group_cols=["g"]).collect()}
    assert out[("g1", 0.0, 0.0)] == (4, 4, 4.0, True)
    assert out[("g1", 5.0, 5.0)] == (2, 3,
                                     round(1.0 + np.sqrt(2.0), 9), False)
    assert out[("g2", 0.0, 0.0)] == (4, 4, 4.0, True)
    assert len(out) == 3


def test_stitch_contour_roundtrip(spark):
    from raster2dggs_spark.operators.vector import (
        contour_segments, stitch_segments,
    )

    # pyramid surface -> single closed ring polyline per level
    n = 21
    rows = []
    for y in range(n):
        for x in range(n):
            rows.append(("p", x, y,
                         10.0 - max(abs(x - 10), abs(y - 10))))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["img", "x", "y", "z"]))
    segs = contour_segments(df, levels=[6.5], group_cols=["img"])
    out = stitch_segments(segs, group_cols=["img", "level"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r.closed and r.n_segs == r.n_vertices
    assert abs(r.length - (4 * 7 - 8 * 0.5 + 4 * np.sqrt(0.5))) < 1e-9
