"""polygonize_boundaries: boundary rings of labeled lattice regions."""

import pandas as pd

from raster2dggs_spark.operators.vector import polygonize_boundaries


def _df(spark, cells):
    return spark.createDataFrame(
        pd.DataFrame(cells, columns=["x", "y", "label"]))


def test_single_cell_square(spark):
    out = polygonize_boundaries(_df(spark, [(5, 7, 1)])).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_segs, r.n_vertices, r.length, r.closed) == (4, 4, 4.0,
                                                            True)
    assert (r.anchor_x, r.anchor_y) == (5.0, 7.0)


def test_rectangle_perimeter(spark):
    cells = [(x, y, 9) for x in range(3) for y in range(2)]
    r = polygonize_boundaries(_df(spark, cells)).collect()[0]
    # 3x2 block: perimeter 2*(3+2) = 10
    assert (r.n_segs, r.length, r.closed) == (10, 10.0, True)


def test_region_with_hole_two_rings(spark):
    # 3x3 block minus the centre: outer ring (12) + inner ring (4)
    cells = [(x, y, 2) for x in range(3) for y in range(3)
             if not (x == 1 and y == 1)]
    rows = polygonize_boundaries(_df(spark, cells)).collect()
    assert len(rows) == 2
    stats = sorted((r.n_segs, r.length, r.closed) for r in rows)
    assert stats == [(4, 4.0, True), (12, 12.0, True)]


def test_two_classes_shared_edge(spark):
    # two 1x1 cells side by side, different labels: each its own
    # square ring; the shared edge appears in BOTH rings
    rows = polygonize_boundaries(
        _df(spark, [(0, 0, 1), (1, 0, 2)])).collect()
    assert len(rows) == 2
    assert all(r.n_segs == 4 and r.closed for r in rows)


def test_same_class_shared_edge_merges(spark):
    rows = polygonize_boundaries(
        _df(spark, [(0, 0, 1), (1, 0, 1)])).collect()
    assert len(rows) == 1
    assert rows[0].n_segs == 6  # 2x1 block perimeter


def test_diagonal_saddle_merges_rings(spark):
    # two same-label cells touching only at a corner: the boundary
    # graphs share the corner vertex -> ONE component (8-connected
    # boundary contract), degree 4 at the saddle still closed
    rows = polygonize_boundaries(
        _df(spark, [(0, 0, 3), (1, 1, 3)])).collect()
    assert len(rows) == 1
    assert rows[0].n_segs == 8 and rows[0].closed


def test_groups_isolate(spark):
    df = spark.createDataFrame(pd.DataFrame(
        [(0, 0, 0, 1), (1, 0, 0, 1)], columns=["g", "x", "y", "label"]))
    rows = polygonize_boundaries(df, group_cols=["g"]).collect()
    # different g groups -> separate squares
    assert len(rows) == 2 and all(r.n_segs == 4 for r in rows)


def test_line_intersections_known(spark):
    from raster2dggs_spark.operators.vector import line_intersections

    # X cross at (0.5, 0.5); parallel pair never crosses; T-touch at
    # an endpoint reports with u on the closed boundary
    la = spark.createDataFrame(
        [(1, [0.0, 1.0], [0.0, 1.0]),        # diagonal up
         (2, [0.0, 1.0], [3.0, 3.0])],       # horizontal at y=3
        "a_id long, xs array<double>, ys array<double>")
    lb = spark.createDataFrame(
        [(7, [0.0, 1.0], [1.0, 0.0]),        # diagonal down -> X
         (8, [0.0, 1.0], [4.0, 4.0]),        # parallel to a_id=2
         (9, [0.5, 0.5], [3.0, 5.0])],       # T: starts ON a_id=2
        "b_id long, xs array<double>, ys array<double>")
    out = {(r.a_id, r.b_id): (r.ix, r.iy)
           for r in line_intersections(la, lb, res=8).collect()}
    assert out[(1, 7)] == (0.5, 0.5)
    assert out[(2, 9)] == (0.5, 3.0)
    assert (2, 8) not in out and len(out) == 2


def test_line_intersections_vs_bruteforce(spark):
    import numpy as np
    import pandas as pd

    from raster2dggs_spark.operators.vector import line_intersections

    rng = np.random.default_rng(21)

    def mk(n, seed_off):
        rows = []
        for i in range(n):
            x0 = float(rng.uniform(-5, 5)); y0 = float(rng.uniform(-5, 5))
            rows.append((i, [x0, x0 + float(rng.uniform(-2, 2))],
                         [y0, y0 + float(rng.uniform(-2, 2))]))
        return rows

    ra, rb = mk(40, 0), mk(40, 1)
    la = spark.createDataFrame(
        pd.DataFrame(ra, columns=["a_id", "xs", "ys"]))
    lb = spark.createDataFrame(
        pd.DataFrame(rb, columns=["b_id", "xs", "ys"]))
    got = {(r.a_id, r.b_id) for r in
           line_intersections(la, lb, res=10).collect()}
    want = set()
    for ai, axs, ays in ra:
        for bi, bxs, bys in rb:
            dxa, dya = axs[1] - axs[0], ays[1] - ays[0]
            dxb, dyb = bxs[1] - bxs[0], bys[1] - bys[0]
            den = dxa * dyb - dya * dxb
            if den == 0:
                continue
            ex, ey = bxs[0] - axs[0], bys[0] - ays[0]
            t = (ex * dyb - ey * dxb) / den
            u = (ex * dya - ey * dxa) / den
            if 0 <= t <= 1 and 0 <= u <= 1:
                want.add((ai, bi))
    assert got == want
