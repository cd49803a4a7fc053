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
