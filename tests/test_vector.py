"""simplify_lines (Douglas-Peucker) vs a brute-force recursive oracle."""

import numpy as np
import pandas as pd
import pytest


def _rdp_keep(x, y, eps):
    """Textbook recursive RDP with the operator's documented tie-breaks:
    strict > split, first-max (smallest index) vertex, zero chord ->
    distance to anchor."""
    n = len(x)
    keep = [False] * n
    keep[0] = keep[-1] = True

    def rec(s, e):
        if e - s < 2:
            return
        dx, dy = x[e] - x[s], y[e] - y[s]
        len2 = dx * dx + dy * dy
        best, bm = -1, -1.0
        for i in range(s + 1, e):
            if len2 == 0:
                m = (x[i] - x[s]) ** 2 + (y[i] - y[s]) ** 2
            else:
                cr = dx * (y[i] - y[s]) - dy * (x[i] - x[s])
                m = cr * cr
            if m > bm:
                best, bm = i, m
        thr = eps * eps * (len2 if len2 != 0 else 1)
        if bm > thr:
            keep[best] = True
            rec(s, best)
            rec(best, e)

    rec(0, n - 1)
    return keep


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_simplify_matches_recursive_oracle(spark, seed):
    from raster2dggs_spark.operators.vector import simplify_lines

    rng = np.random.default_rng(seed)
    rows = []
    expected = []
    for lid in range(12):
        n = int(rng.integers(2, 40))
        x = np.cumsum(rng.integers(1, 6, n)).astype(np.int64)
        y = rng.integers(-30, 30, n).astype(np.int64)
        if lid % 4 == 0 and n > 3:  # closed ring
            x[-1], y[-1] = x[0], y[0]
        keep = _rdp_keep(x, y, 4)
        for i in range(n):
            rows.append((lid, i, int(x[i]), int(y[i])))
            if keep[i]:
                expected.append((lid, i, int(x[i]), int(y[i])))
    df = spark.createDataFrame(rows, "line_id int, seq int, x long, y long")
    got = sorted(map(tuple, simplify_lines(df, 4.0).collect()))
    assert got == sorted(expected)


def test_simplify_float_path_and_edges(spark):
    from raster2dggs_spark.operators.vector import simplify_lines

    # collinear float line collapses to its endpoints; 2-point line kept
    rows = ([(0, i, float(i), 2.0 * i + 0.0001 * (i % 2)) for i in range(9)]
            + [(1, 0, 0.0, 0.0), (1, 1, 5.0, 5.0)])
    df = spark.createDataFrame(rows, "line_id int, seq int, x double, y double")
    out = simplify_lines(df, 0.5).toPandas()
    l0 = out[out.line_id == 0].seq.tolist()
    assert sorted(l0) == [0, 8]
    assert sorted(out[out.line_id == 1].seq.tolist()) == [0, 1]
    # eps=0 keeps every non-collinear vertex
    zig = [(0, i, i, i % 2) for i in range(7)]
    dz = spark.createDataFrame(zig, "line_id int, seq int, x long, y long")
    assert simplify_lines(dz, 0.0).count() == 7
    with pytest.raises(ValueError):
        simplify_lines(dz, -1.0)
