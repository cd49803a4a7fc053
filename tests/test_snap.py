"""snap_to_segments: point -> nearest-polyline-segment map matching.

Closed-form checks of the pinned local-equirectangular clamped-
projection metric (operators/joins.py snap_to_segments), the radius
filter, endpoint clamping, the total tie-break, and antimeridian
segment coherence (a far-side segment must NOT alias into a nearby
fictitious chord — the bug the oracle caught)."""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from raster2dggs_spark.operators.joins import (
    EARTH_R, explode_segments, snap_to_segments)

M_DEG = math.radians(1.0) * EARTH_R


def _lines(spark, rows):
    return spark.createDataFrame(
        rows, "line_id long, xs array<double>, ys array<double>")


def _points(spark, rows):
    return spark.createDataFrame(
        rows, "point_id long, lon double, lat double")


def test_explode_segments(spark):
    df = _lines(spark, [(1, [0.0, 1.0, 2.0], [0.0, 1.0, 0.0]),
                        (2, [5.0], [5.0])])
    out = explode_segments(df).orderBy("line_id", "seg_idx").collect()
    assert [(r.line_id, r.seg_idx, r.ax, r.ay, r.bx, r.by)
            for r in out] == [
        (1, 0, 0.0, 0.0, 1.0, 1.0), (1, 1, 1.0, 1.0, 2.0, 0.0)]


def test_perpendicular_distance_equator(spark):
    # horizontal segment on the equator; point 0.5 deg north of its
    # middle -> perpendicular snap, dist = 0.5 deg of meridian arc
    lines = _lines(spark, [(7, [10.0, 12.0], [0.0, 0.0])])
    pts = _points(spark, [(1, 11.0, 0.5)])
    r = snap_to_segments(pts, lines, radius_m=200_000.0).collect()
    assert len(r) == 1
    row = r[0]
    assert row.line_id == 7 and row.seg_idx == 0
    assert row.dist_m == pytest.approx(0.5 * M_DEG, abs=0.5)
    assert row.t_frac == pytest.approx(0.5, abs=1e-9)
    assert row.snap_lon == pytest.approx(11.0, abs=1e-6)
    assert row.snap_lat == pytest.approx(0.0, abs=1e-6)


def test_endpoint_clamp_and_tiebreak(spark):
    # point beyond the shared vertex of two collinear segments: both
    # tie at the vertex distance; the LOWER seg_idx must win (total
    # tie-break on (round(dist,4), line_id, seg_idx))
    lines = _lines(spark, [(3, [0.0, 1.0, 2.0], [0.0, 0.0, 0.0])])
    pts = _points(spark, [(1, 1.0, 0.25)])  # above shared vertex
    r = snap_to_segments(pts, lines, radius_m=100_000.0).collect()[0]
    assert (r.line_id, r.seg_idx) == (3, 0)
    assert r.t_frac == pytest.approx(1.0)
    # beyond the far end: clamps to t=1 of the LAST segment
    pts2 = _points(spark, [(2, 2.5, 0.0)])
    r2 = snap_to_segments(pts2, lines, radius_m=100_000.0).collect()[0]
    assert (r2.seg_idx, r2.t_frac) == (1, pytest.approx(1.0))
    assert r2.dist_m == pytest.approx(0.5 * M_DEG, rel=1e-6)


def test_radius_filter_inner_semantics(spark):
    lines = _lines(spark, [(1, [0.0, 1.0], [0.0, 0.0])])
    pts = _points(spark, [(1, 0.5, 0.1), (2, 0.5, 30.0)])
    out = snap_to_segments(pts, lines, radius_m=50_000.0)
    got = {r.point_id for r in out.collect()}
    assert got == {1}  # point 2 far outside the radius -> absent


def test_cos_lat_scaling(spark):
    # vertical segment at lat 60; point 1 deg of LON away: distance
    # must carry cos(60 deg) ~ 0.5, not equatorial degrees
    lines = _lines(spark, [(1, [20.0, 20.0], [59.5, 60.5])])
    pts = _points(spark, [(9, 21.0, 60.0)])
    r = snap_to_segments(pts, lines, radius_m=100_000.0).collect()[0]
    assert r.dist_m == pytest.approx(
        math.cos(math.radians(60.0)) * M_DEG, rel=1e-9)


def test_antimeridian_segment_coherent(spark):
    # a short segment on the FAR side of the globe must not alias into
    # a nearby chord through per-endpoint wrapping; and a segment
    # straddling the antimeridian must snap correctly from both sides
    far = _lines(spark, [(1, [134.25, 134.5], [-32.8, -32.9])])
    pts = _points(spark, [(22, -45.7, -33.7)])
    assert snap_to_segments(pts, far, radius_m=500_000.0).count() == 0
    straddle = _lines(spark, [(2, [179.5, -179.5], [0.0, 0.0])])
    west = _points(spark, [(5, -179.8, 0.3)])
    r = snap_to_segments(west, straddle, radius_m=100_000.0).collect()[0]
    assert r.dist_m == pytest.approx(0.3 * M_DEG, rel=1e-6)
    assert abs(r.snap_lon) >= 179.0 or r.snap_lon == pytest.approx(
        -179.8, abs=0.5)


def test_nearest_of_many_lines(spark):
    # brute-force parity on a small random-ish set
    rng = np.random.default_rng(42)
    lines_py = []
    for i in range(30):
        x0 = float(rng.uniform(-30, 30)); y0 = float(rng.uniform(-30, 30))
        lines_py.append((i, [x0, x0 + 1.0, x0 + 2.0],
                         [y0, y0 + 0.5, y0 - 0.5]))
    pts_py = [(j, float(rng.uniform(-30, 30)), float(rng.uniform(-30, 30)))
              for j in range(40)]
    lines = _lines(spark, lines_py)
    pts = _points(spark, pts_py)
    out = {r.point_id: (r.line_id, r.seg_idx, r.dist_m)
           for r in snap_to_segments(pts, lines,
                                     radius_m=800_000.0).collect()}

    def seg_d(px, py, ax, ay, bx, by):
        k = math.cos(math.radians(py)) * M_DEG
        axm = (ax - px) * k; aym = (ay - py) * M_DEG
        bxm = (bx - px) * k; bym = (by - py) * M_DEG
        vx, vy = bxm - axm, bym - aym
        l2 = vx * vx + vy * vy
        t = max(0.0, min(1.0, -(axm * vx + aym * vy) / l2)) if l2 else 0.0
        cx, cy = axm + t * vx, aym + t * vy
        return math.hypot(cx, cy)

    for pid, px, py in pts_py:
        best = min(((round(seg_d(px, py, xs[s], ys[s], xs[s + 1],
                                 ys[s + 1]), 4), li, s)
                    for li, xs, ys in lines_py for s in range(2)))
        if best[0] <= 800_000.0:
            assert pid in out, pid
            got = out[pid]
            assert (got[0], got[1]) == (best[1], best[2]), (pid, got, best)
            assert got[2] == pytest.approx(best[0], abs=1e-3)
        else:
            assert pid not in out


def test_snap_rejects_negative_line_ids(spark):
    lines = spark.createDataFrame(
        [(-1, [0.0, 1.0], [0.0, 0.0])],
        "line_id long, xs array<double>, ys array<double>")
    pts = _points(spark, [(1, 0.5, 0.1)])
    with pytest.raises(ValueError, match="negative line ids"):
        snap_to_segments(pts, lines, radius_m=50_000.0)


def test_snap_rejects_polar_domain(spark):
    lines = _lines(spark, [(1, [0.0, 1.0], [89.0, 89.0])])
    pts = _points(spark, [(1, 0.5, 89.4)])
    with pytest.raises(ValueError, match="pole"):
        snap_to_segments(pts, lines, radius_m=300_000.0)
