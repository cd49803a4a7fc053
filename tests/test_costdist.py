"""Cost distance (operators/costdist.py): block-synchronous Dijkstra vs
a brute-force whole-grid Dijkstra on quadkey (with an antimeridian wall
gap forcing wrap paths) and geohash (asymmetric extents, sparse cells),
plus the error paths and the frontier-restriction evidence."""

import heapq

import numpy as np
import pandas as pd
import pytest

from raster2dggs_spark.operators.costdist import cost_distance

_OFFS = ((-1, -1, 7), (0, -1, 5), (1, -1, 7), (-1, 0, 5), (1, 0, 5),
         (-1, 1, 7), (0, 1, 5), (1, 1, 7))


def _brute(gx, gy, cost, src, wlon, sid=None):
    """Whole-grid multi-source Dijkstra (lon wraps, lat clips); tracks
    the lexicographic-min (dist, source id) pair when sid is given."""
    big = np.iinfo(np.int64).max
    idx = {(int(gx[i]), int(gy[i])): i for i in range(len(gx))
           if np.isfinite(cost[i])}
    best = {i: (np.inf, big) for i in idx.values()}
    h = []
    for i in idx.values():
        if src[i]:
            a = int(sid[i]) if sid is not None else 0
            best[i] = (0.0, a)
            h.append((0.0, a, i))
    heapq.heapify(h)
    while h:
        d, a, u = heapq.heappop(h)
        if (d, a) > best[u]:
            continue
        for dx, dy, m in _OFFS:
            v = idx.get((int((gx[u] + dx) % wlon), int(gy[u] + dy)))
            if v is None:
                continue
            nd = d + (cost[u] + cost[v]) * m
            if (nd, a) < best[v]:
                best[v] = (nd, a)
                heapq.heappush(h, (nd, a, v))
    return {i: best[i][0] for i in idx.values()}, \
           {i: best[i][1] for i in idx.values()}


def _check(out, cells, exp):
    bycell = {int(c): i for i, c in enumerate(cells)}
    assert len(out) == len(cells)
    for r in out.itertuples(index=False):
        i = bycell[int(r.cell)]
        e = exp.get(i)
        got = None if pd.isna(r.dist) else float(r.dist)
        if e is None or not np.isfinite(e):
            assert got is None, (r.cell, got)
        else:
            assert got is not None and abs(got - e) < 1e-9, (r.cell, got, e)


def test_quadkey_matches_bruteforce(spark):
    """32x32 quadkey grid, 15% impassable + a meridian wall with one
    gap, two sources — paths must wrap the antimeridian to beat the
    wall detour, and the settled surface must equal global Dijkstra."""
    from raster2dggs_spark.dggs import quadkeylib

    level, w = 5, 32
    rng = np.random.default_rng(42)
    tx, ty = np.meshgrid(np.arange(w), np.arange(w))
    tx, ty = tx.ravel(), ty.ravel()
    cost = rng.integers(1, 10, w * w).astype(float)
    wallmask = rng.random(w * w) < 0.15
    wallmask |= (tx == 16) & (ty != 7)
    cost[wallmask] = np.nan
    src = np.zeros(w * w, bool)
    for sx, sy in ((2, 3), (29, 28)):
        i = np.where((tx == sx) & (ty == sy))[0][0]
        cost[i] = 3.0
        src[i] = True
    cells = quadkeylib.tile_to_cell(tx, ty, level)
    df = spark.createDataFrame(
        pd.DataFrame({"cell": cells, "cost": cost, "is_source": src}))

    stats = {}
    out = cost_distance(df, dggs="quadkey", block_bits=3,
                        stats=stats).toPandas()
    _check(out, cells, _brute(tx, ty, cost, src, w)[0])
    # frontier restriction: cumulative active blocks << rounds * 16
    assert stats["rounds"] >= 3
    assert stats["blocks_run"] < stats["rounds"] * 16


def test_geohash_sparse_matches_bruteforce(spark):
    """Sparse geohash prec-2 layer (60% of the globe absent => absent
    cells are walls), float costs, multiple scattered sources."""
    from raster2dggs_spark.dggs import geohashlib

    prec = 2
    wlon = wlat = 32
    rng = np.random.default_rng(7)
    gx, gy = np.meshgrid(np.arange(wlon), np.arange(wlat))
    gx, gy = gx.ravel(), gy.ravel()
    keep = rng.random(wlon * wlat) < 0.4
    gx, gy = gx[keep], gy[keep]
    lon = (gx + 0.5) / wlon * 360.0 - 180.0
    lat = (gy + 0.5) / wlat * 180.0 - 90.0
    cells = geohashlib.lonlat_to_cell(lon, lat, prec)
    cost = rng.uniform(0.5, 4.0, len(gx)).round(2)
    src = rng.random(len(gx)) < 0.02
    cost[src] = 1.0
    assert src.sum() >= 2
    df = spark.createDataFrame(
        pd.DataFrame({"cell": cells, "cost": cost, "is_source": src}))

    out = cost_distance(df, dggs="geohash", block_bits=3).toPandas()
    _check(out, cells, _brute(gx, gy, cost, src, wlon)[0])


def test_cost_allocation_matches_bruteforce(spark):
    """id_col tracking: every reached cell is labelled with the
    lex-min (dist, source id) winner — equal-cost ties (integer costs
    make them common) must break to the MINIMUM id on both engines."""
    from raster2dggs_spark.dggs import quadkeylib

    level, w = 5, 32
    rng = np.random.default_rng(11)
    tx, ty = np.meshgrid(np.arange(w), np.arange(w))
    tx, ty = tx.ravel(), ty.ravel()
    cost = rng.integers(1, 4, w * w).astype(float)
    cost[rng.random(w * w) < 0.1] = np.nan
    src = rng.random(w * w) < 0.01
    cost[src] = 1.0
    sid = np.where(src, (tx * 131 + ty * 7) % 100, -1).astype(np.int64)
    assert src.sum() >= 3
    cells = quadkeylib.tile_to_cell(tx, ty, level)
    df = spark.createDataFrame(
        pd.DataFrame({"cell": cells, "cost": cost, "is_source": src,
                      "zone": sid}))

    out = cost_distance(df, dggs="quadkey", block_bits=3,
                        id_col="zone").toPandas()
    exp_d, exp_a = _brute(tx, ty, cost, src, w, sid=sid)
    _check(out, cells, exp_d)
    bycell = {int(c): i for i, c in enumerate(cells)}
    for r in out.itertuples(index=False):
        i = bycell[int(r.cell)]
        if i in exp_d and np.isfinite(exp_d[i]):
            assert int(r.alloc) == exp_a[i], (r.cell, r.alloc, exp_a[i])
        else:
            assert pd.isna(r.alloc)


def test_cost_corridor(spark):
    """Corridor = dA + dB per cell; its min equals the A->B least cost
    and the min-cell set contains every cell on some optimal path."""
    from raster2dggs_spark.operators.costdist import cost_corridor

    from raster2dggs_spark.dggs import quadkeylib

    w = 16
    rng = np.random.default_rng(5)
    tx, ty = np.meshgrid(np.arange(w), np.arange(w))
    tx, ty = tx.ravel(), ty.ravel()
    cost = rng.integers(1, 6, w * w).astype(float)
    is_a = (tx == 1) & (ty == 1)
    is_b = (tx == 14) & (ty == 14)
    cells = quadkeylib.tile_to_cell(tx, ty, 4)
    df = spark.createDataFrame(
        pd.DataFrame({"cell": cells, "cost": cost,
                      "is_a": is_a, "is_b": is_b}))
    out = cost_corridor(df, dggs="quadkey", block_bits=3).toPandas()

    da, _ = _brute(tx, ty, cost, is_a, w)
    db, _ = _brute(tx, ty, cost, is_b, w)
    exp = {i: da[i] + db[i] for i in da}
    bycell = {int(c): i for i, c in enumerate(cells)}
    assert len(out) == w * w
    best = min(exp.values())
    for r in out.itertuples(index=False):
        i = bycell[int(r.cell)]
        assert abs(float(r.corridor) - exp[i]) < 1e-9
        assert abs(float(r.best) - best) < 1e-9

    # mutually unreachable: TWO NaN walls (lon wraps, one won't do)
    cost2 = cost.copy()
    cost2[(tx == 8) | (tx == 0)] = np.nan
    cost2[is_a | is_b] = 1.0
    df2 = spark.createDataFrame(
        pd.DataFrame({"cell": cells, "cost": cost2,
                      "is_a": is_a, "is_b": is_b}))
    with pytest.raises(ValueError, match="unreachable"):
        cost_corridor(df2, dggs="quadkey", block_bits=3)


def test_error_paths(spark):
    from raster2dggs_spark.dggs import quadkeylib

    tx = np.arange(8)
    cells = quadkeylib.tile_to_cell(tx, np.zeros(8, np.int64), 3)
    pdf = pd.DataFrame({"cell": cells,
                        "cost": np.ones(8),
                        "is_source": [True] + [False] * 7})
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="block_bits"):
        cost_distance(df, dggs="quadkey", block_bits=0)
    bad = pdf.copy()
    bad.loc[0, "cost"] = np.nan
    with pytest.raises(ValueError, match="impassable"):
        cost_distance(spark.createDataFrame(bad), dggs="quadkey")
    none = pdf.copy()
    none["is_source"] = False
    with pytest.raises(ValueError, match="source"):
        cost_distance(spark.createDataFrame(none), dggs="quadkey")
    with pytest.raises(RuntimeError, match="converge"):
        cost_distance(df, dggs="quadkey", block_bits=1, max_rounds=1)


def _clump_brute(gx, gy, cls, ids, wlon, diagonal):
    """BFS reference: min id per connected equal-class component."""
    offs = [(1, 0), (-1, 0), (0, 1), (0, -1)]
    if diagonal:
        offs += [(1, 1), (1, -1), (-1, 1), (-1, -1)]
    pos = {(int(gx[i]), int(gy[i])): i for i in range(len(gx))
           if not np.isnan(cls[i])}
    lab = {}
    for start in pos.values():
        if start in lab:
            continue
        comp, todo = [start], [start]
        seen = {start}
        while todo:
            u = todo.pop()
            for dx, dy in offs:
                v = pos.get((int((gx[u] + dx) % wlon), int(gy[u] + dy)))
                if v is None or v in seen or cls[v] != cls[u]:
                    continue
                seen.add(v)
                comp.append(v)
                todo.append(v)
        m = min(int(ids[i]) for i in comp)
        for i in comp:
            lab[i] = m
    return lab


@pytest.mark.parametrize("diagonal", [False, True])
def test_clump_matches_bruteforce(spark, diagonal):
    """Random 4-class 32x32 quadkey layer with 10% holes: every cell's
    clump label equals the BFS min-id of its equal-class component —
    rook and queen, including components that wrap the antimeridian."""
    from raster2dggs_spark.dggs import quadkeylib
    from raster2dggs_spark.operators.costdist import clump_cells

    w = 32
    rng = np.random.default_rng(13)
    tx, ty = np.meshgrid(np.arange(w), np.arange(w))
    tx, ty = tx.ravel(), ty.ravel()
    cls = rng.integers(0, 4, w * w).astype(float)
    cls[rng.random(w * w) < 0.1] = np.nan
    ids = (tx * 1000 + ty).astype(np.int64)
    cells = quadkeylib.tile_to_cell(tx, ty, 5)
    df = spark.createDataFrame(
        pd.DataFrame({"cell": cells, "cls": cls, "pid": ids}))

    stats = {}
    out = clump_cells(df, "cls", "pid", dggs="quadkey", block_bits=3,
                      diagonal=diagonal, stats=stats).toPandas()
    exp = _clump_brute(tx, ty, cls, ids, w, diagonal)
    bycell = {int(c): i for i, c in enumerate(cells)}
    assert len(out) == w * w
    for r in out.itertuples(index=False):
        i = bycell[int(r.cell)]
        if i in exp:
            assert int(r.clump) == exp[i], (tx[i], ty[i])
        else:
            assert pd.isna(r.clump)
    assert stats["rounds"] >= 1


def test_sieve_cells_speckle_removal(spark):
    import numpy as np
    import pandas as pd

    from raster2dggs_spark.dggs import quadkeylib
    from raster2dggs_spark.operators.costdist import sieve_cells

    # 10x10 background of class 0 with a 2-cell speckle of class 1 and
    # a 12-cell legitimate patch of class 2
    W = H = 10
    gx = (np.arange(W * H) % W).astype(np.int64)
    gy = (np.arange(W * H) // W).astype(np.int64)
    cls = np.zeros(W * H, np.int64)
    cls[(gy == 4) & ((gx == 4) | (gx == 5))] = 1          # speckle
    patch = (gy >= 7) & (gx < 4)                           # 3x4 = 12
    cls[patch] = 2
    pid = gy * W + gx
    cell = quadkeylib.tile_to_cell(gx + 8, gy + 40, 7)
    df = spark.createDataFrame(pd.DataFrame(
        {"cell": cell, "cls": cls, "pid": pid}))
    out = (sieve_cells(df, "cls", "pid", min_size=6, dggs="quadkey",
                       block_bits=3)
           .toPandas())
    out["gx"] = gx[out.pid.to_numpy()]                     # pid = y*W+x
    sp = out[out.cls == 1]
    assert len(sp) == 2
    assert (sp.sieved == 0).all() and sp.reassigned.all()
    assert (sp.clump_size == 2).all()
    pt = out[out.cls == 2]
    assert (pt.sieved == 2).all() and not pt.reassigned.any()
    bg = out[out.cls == 0]
    assert (bg.sieved == 0).all() and not bg.reassigned.any()


def test_sieve_small_without_large_neighbor_keeps_class(spark):
    import numpy as np
    import pandas as pd

    from raster2dggs_spark.dggs import quadkeylib
    from raster2dggs_spark.operators.costdist import sieve_cells

    # two adjacent SMALL regions only: neither is >= min_size, so
    # nothing is reassigned (single-pass, non-cascading semantics)
    gx = np.array([0, 1, 2, 3], np.int64)
    gy = np.zeros(4, np.int64)
    cls = np.array([0, 0, 1, 1], np.int64)
    cell = quadkeylib.tile_to_cell(gx + 8, gy + 40, 7)
    df = spark.createDataFrame(pd.DataFrame(
        {"cell": cell, "cls": cls, "pid": gx}))
    out = (sieve_cells(df, "cls", "pid", min_size=6, dggs="quadkey",
                       block_bits=3).toPandas())
    assert not out.reassigned.any()
    assert (out.sieved == out.cls).all()


def test_least_cost_path_matches_brute_backtrace(spark):
    """least_cost_path vs a python Dijkstra + min-pid backtrace on a
    16x16 quadkey grid whose meridian wall forces the path to wrap the
    antimeridian (exercises the pmod neighbour join)."""
    from raster2dggs_spark.dggs import quadkeylib
    from raster2dggs_spark.operators.costdist import least_cost_path

    level, w = 4, 16
    rng = np.random.default_rng(11)
    tx, ty = np.meshgrid(np.arange(w), np.arange(w))
    tx, ty = tx.ravel(), ty.ravel()
    cost = rng.integers(1, 10, w * w).astype(float)
    live = ~((tx == 8) & (ty != 1))        # wall with one gap at y=1
    tx, ty, cost = tx[live], ty[live], cost[live]
    src = (tx == 2) & (ty == 12)
    tgt = (tx == 13) & (ty == 12)          # wrapping beats the gap detour
    pid = (ty * w + tx).astype(np.int64)
    cells = quadkeylib.tile_to_cell(tx, ty, level)
    df = spark.createDataFrame(pd.DataFrame(
        {"cell": cells, "cost": cost, "is_source": src,
         "is_target": tgt, "pid": pid}))
    out = least_cost_path(df, source_col="is_source",
                          target_col="is_target", id_col="pid",
                          dggs="quadkey", block_bits=2)
    got = sorted((int(r.pid), float(r.dist), int(r.step))
                 for r in out.collect())

    dist, _ = _brute(tx, ty, cost, src, w)
    idx = {(int(tx[i]), int(ty[i])): i for i in range(len(tx))}
    # brute backtrace: predecessor = min pid among exact witnesses
    ti = int(np.where(tgt)[0][0])
    path = [ti]
    while not src[path[-1]]:
        u = path[-1]
        best = None
        for dx, dy, m in _OFFS:
            v = idx.get((int((tx[u] + dx) % w), int(ty[u] + dy)))
            if v is None:
                continue
            if dist[v] + (cost[v] + cost[u]) * m == dist[u]:
                if best is None or pid[v] < pid[best]:
                    best = v
        assert best is not None
        path.append(best)
    exp = sorted((int(pid[v]), float(dist[v]), s)
                 for s, v in enumerate(path))
    assert got == exp
    # the wrap actually happened: some path cell sits at tx in {14,15,0,1}
    xs = {int(p) % w for p, _, _ in got}
    assert xs & {14, 15, 0, 1}
