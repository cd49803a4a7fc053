"""morphology_cells — pinned against a brute-force set reference."""

import numpy as np
import pytest

from raster2dggs_spark.dggs import geohashlib, quadkeylib
from raster2dggs_spark.operators.focal import morphology_cells


def _se(k, metric):
    out = []
    for dx in range(-k, k + 1):
        for dy in range(-k, k + 1):
            if metric == "manhattan" and abs(dx) + abs(dy) > k:
                continue
            out.append((dx, dy))
    return out


def _brute(cells, op, k, metric, wlon, wlat):
    se = _se(k, metric)
    s = set(cells)
    if op == "open":
        return _brute(_brute(s, "erode", k, metric, wlon, wlat),
                      "dilate", k, metric, wlon, wlat)
    if op == "close":
        return _brute(_brute(s, "dilate", k, metric, wlon, wlat),
                      "erode", k, metric, wlon, wlat)
    if op == "dilate":
        out = set()
        for (x, y) in s:
            for dx, dy in se:
                ny = y + dy
                if 0 <= ny < wlat:
                    out.add(((x + dx) % wlon, ny))
        return out
    out = set()
    for (x, y) in s:
        ok = True
        for dx, dy in se:
            ny = y + dy
            if not (0 <= ny < wlat) or ((x + dx) % wlon, ny) not in s:
                ok = False
                break
        if ok:
            out.add((x, y))
    return out


def _mk(spark, idx, dggs, prec):
    xs = np.array([x for x, _ in idx], dtype=np.int64)
    ys = np.array([y for _, y in idx], dtype=np.int64)
    if dggs == "quadkey":
        ids = quadkeylib.tile_to_cell(xs, ys, prec)
    else:
        ids = geohashlib.cell_from_indices(xs, ys, prec)
    return spark.createDataFrame([(int(c),) for c in ids], "cell long")


@pytest.mark.parametrize("dggs,prec,wlon,wlat",
                         [("geohash", 2, 32, 32), ("quadkey", 5, 32, 32)])
@pytest.mark.parametrize("op", ["dilate", "erode", "open", "close"])
@pytest.mark.parametrize("metric", ["chebyshev", "manhattan"])
def test_morphology_matches_brute(spark, dggs, prec, wlon, wlat, op, metric):
    rng = np.random.RandomState(3)
    idx = {(int(x), int(y)) for x, y in
           zip(rng.randint(0, wlon, 220), rng.randint(0, wlat, 220))}
    # a solid 5x5 block so erosion has survivors
    idx |= {(10 + i, 10 + j) for i in range(5) for j in range(5)}
    df = _mk(spark, sorted(idx), dggs, prec)
    got = morphology_cells(df, op=op, metric=metric, dggs=dggs,
                           keep_indices=True)
    pairs = {(r.gx, r.gy) for r in got.collect()}
    assert pairs == _brute(idx, op, 1, metric, wlon, wlat)


def test_morphology_k2_and_wrap(spark):
    # a point hugging the antimeridian column dilates across the wrap
    wlon = wlat = 32
    idx = {(0, 16), (31, 5)}
    df = _mk(spark, sorted(idx), "quadkey", 5)
    got = morphology_cells(df, op="dilate", k=2, dggs="quadkey",
                           keep_indices=True)
    pairs = {(r.gx, r.gy) for r in got.collect()}
    assert pairs == _brute(idx, "dilate", 2, "chebyshev", wlon, wlat)
    assert (30, 16) in pairs and (1, 5) in pairs  # wrapped both ways


def test_morphology_pole_clip_erodes_edge(spark):
    # a solid block touching the top row erodes its edge rows AND the
    # pole-adjacent row (out-of-lattice counts absent)
    idx = {(x, y) for x in range(4, 9) for y in range(0, 4)}
    df = _mk(spark, sorted(idx), "geohash", 2)
    got = morphology_cells(df, op="erode", dggs="geohash",
                           keep_indices=True)
    pairs = {(r.gx, r.gy) for r in got.collect()}
    assert pairs == _brute(idx, "erode", 1, "chebyshev", 32, 32)
    assert all(y >= 1 for _, y in pairs)


def test_morphology_cell_ids_roundtrip(spark):
    # output ids decode back to exactly the reported indices
    idx = {(5, 5), (6, 5), (5, 6), (6, 6)}
    df = _mk(spark, sorted(idx), "geohash", 2)
    got = morphology_cells(df, op="dilate", dggs="geohash",
                           keep_indices=True).collect()
    ids = np.array([r.cell for r in got], dtype=np.int64)
    assert (geohashlib.get_precision(ids.astype(np.uint64)) == 2).all()
    from raster2dggs_spark.operators.focal import lattice_indices
    dec = lattice_indices(
        spark.createDataFrame([(int(c),) for c in ids], "cell long"),
        "cell", "geohash").collect()
    assert {(r.gx, r.gy) for r in dec} == {(r.gx, r.gy) for r in got}


def test_morphology_bad_args(spark):
    df = _mk(spark, [(1, 1)], "geohash", 2)
    with pytest.raises(ValueError, match="op"):
        morphology_cells(df, op="blur")
    with pytest.raises(ValueError, match="metric"):
        morphology_cells(df, metric="euclid")
    with pytest.raises(ValueError, match="k >= 1"):
        morphology_cells(df, k=0)


def test_geary_c_checkerboard_and_smooth(spark):
    # checkerboard -> strong negative autocorrelation (C > 1);
    # a smooth gradient -> strong positive (C < 1); brute-force parity.
    import numpy as np

    from raster2dggs_spark.operators.focal import geary_c

    def brute(vals):
        idx = {k: v for k, v in vals.items()}
        n = len(idx)
        mu = sum(idx.values()) / n
        den = sum((v - mu) ** 2 for v in idx.values())
        num = w = 0.0
        for (x, y), v in idx.items():
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    if dx == dy == 0:
                        continue
                    nb = ((x + dx) % 32, y + dy)
                    if nb in idx:
                        num += (v - idx[nb]) ** 2
                        w += 1
        return (n - 1) * num / (2 * w * den)

    for kind in ("checker", "ramp"):
        vals = {}
        for x in range(8):
            for y in range(8):
                vals[(x, y)] = (float((x + y) % 2) if kind == "checker"
                                else float(x + y))
        df = _mk(spark, sorted(vals), "geohash", 2)
        from raster2dggs_spark.operators.focal import lattice_indices  # noqa
        vdf = spark.createDataFrame(
            [(int(c), vals[k]) for c, k in zip(
                (geohashlib.cell_from_indices(
                    np.array([k[0] for k in sorted(vals)]),
                    np.array([k[1] for k in sorted(vals)]), 2)),
                sorted(vals))],
            "cell long, v double")
        row = geary_c(vdf, "v", dggs="geohash").collect()[0]
        assert abs(row.geary_c - brute(vals)) < 1e-9
        # queen weights: the checkerboard's 4 diagonal neighbors are
        # EQUAL, so C sits just above 1 (rook-only would be ~2); the
        # smooth ramp is strongly positive-autocorrelated (C << 1)
        if kind == "checker":
            assert row.geary_c > 1.0
        else:
            assert row.geary_c < 0.2
