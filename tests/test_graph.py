"""PageRank + triangle count (operators/graph.py) vs numpy references."""

import numpy as np
import pandas as pd

from raster2dggs_spark.operators.graph import pagerank, triangle_count


def test_pagerank_vs_numpy_power_iteration(spark):
    rng = np.random.default_rng(9)
    n = 40
    edges = set()
    for s in range(n):
        for _ in range(3):
            d = int(rng.integers(0, n))
            edges.add((s, d))
    # a few dangling vertices: remove all out-edges of 3 nodes
    edges = {(s, d) for (s, d) in edges if s not in (5, 17, 23)}
    pdf = pd.DataFrame(sorted(edges), columns=["src", "dst"])
    out = (pagerank(spark.createDataFrame(pdf), iters=8, damping=0.85)
           .toPandas().set_index("vertex").sort_index())

    verts = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    m = len(verts)
    r = np.full(m, 1.0 / m)
    odeg = np.zeros(m)
    for s, d in edges:
        odeg[idx[s]] += 1
    for _ in range(8):
        nxt = np.zeros(m)
        for s, d in edges:
            nxt[idx[d]] += r[idx[s]] / odeg[idx[s]]
        dang = r[odeg == 0].sum()
        r = (1 - 0.85) / m + 0.85 * dang / m + 0.85 * nxt
    want = pd.Series(r, index=verts)
    got = out.loc[verts, "rank"]
    assert np.allclose(got.to_numpy(), want.to_numpy(), rtol=1e-9)
    assert abs(out["rank"].sum() - 1.0) < 1e-9     # mass conserved


def test_triangle_count_known_graphs(spark):
    # K4 has 4 triangles; adding an isolated edge changes nothing;
    # directions and duplicates fold away
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    pdf = pd.DataFrame(k4 + [(10, 11), (11, 10)],
                       columns=["src", "dst"])
    out = triangle_count(spark.createDataFrame(pdf)).collect()[0]
    assert out["n_triangles"] == 4


def test_triangle_count_vs_bruteforce_random(spark):
    # random 30-vertex graph vs the adjacency-matrix trace count
    rng = np.random.default_rng(3)
    es = {(int(a), int(b))
          for a, b in rng.integers(0, 30, (200, 2)) if a != b}
    pdf = pd.DataFrame(sorted(es), columns=["src", "dst"])
    out = triangle_count(spark.createDataFrame(pdf)).collect()[0]
    A = np.zeros((30, 30), dtype=np.int64)
    for a, b in es:
        A[a, b] = A[b, a] = 1
    np.fill_diagonal(A, 0)
    want = int(np.trace(A @ A @ A) // 6)
    assert out["n_triangles"] == want


def test_triangle_count_hub_wedges_linear(spark):
    # star hub of degree 1000 + 5 disjoint triangles: degree
    # orientation points every star edge leaf->hub, so the hub emits
    # ZERO wedge pairs — the candidate volume is linear in edges, not
    # deg(hub)^2 (the naive a<b<c plan would emit ~500k wedge rows at
    # the hub; this was the round-7 scale-weak finding)
    from pyspark.sql import functions as F

    from raster2dggs_spark.operators.graph import _oriented_edges

    star = [(0, i) for i in range(1, 1001)]
    tris = [(2000 + 3 * k + i, 2000 + 3 * k + j)
            for k in range(5) for i, j in ((0, 1), (0, 2), (1, 2))]
    df = spark.createDataFrame(
        pd.DataFrame(star + tris, columns=["src", "dst"]))
    out = triangle_count(df).collect()[0]
    assert out["n_triangles"] == 5
    e = (df.selectExpr("least(src, dst) AS a", "greatest(src, dst) AS b")
         .where("a <> b").distinct())
    oe = _oriented_edges(e)
    lft, rgt = oe.alias("l"), oe.alias("r")
    wedge_n = (lft.join(rgt, "x")
               .where(F.col("l.oy") < F.col("r.oy")).count())
    assert wedge_n == 5   # one wedge per triangle apex, none at the hub


def test_sssp_known_chain(spark):
    from raster2dggs_spark.operators.graph import sssp

    # 1 -2-> 2 -3-> 3 -1-> 4 ; shortcut 1 -10-> 4
    pdf = pd.DataFrame([(1, 2, 2.0), (2, 3, 3.0), (3, 4, 1.0),
                        (1, 4, 10.0)], columns=["src", "dst", "w"])
    st = {}
    out = {r.node: r.dist
           for r in sssp(spark.createDataFrame(pdf), [1],
                         stats=st).collect()}
    assert out == {1: 0.0, 2: 2.0, 3: 5.0, 4: 6.0}
    assert st["rounds"] == 3


def test_sssp_vs_dijkstra_random(spark):
    from raster2dggs_spark.operators.graph import sssp

    rng = np.random.default_rng(7)
    n, m = 40, 160
    es = [(int(rng.integers(0, n)), int(rng.integers(0, n)),
           float(rng.integers(1, 20))) for _ in range(m)]
    out = {r.node: r.dist for r in sssp(
        spark.createDataFrame(pd.DataFrame(
            es, columns=["src", "dst", "w"])), [0],
        directed=False).collect()}
    # reference: O(n^2) Dijkstra on the undirected graph
    import heapq
    adj = {}
    for s, d, w in es:
        adj.setdefault(s, []).append((d, w))
        adj.setdefault(d, []).append((s, w))
    dist = {0: 0.0}
    pq = [(0.0, 0)]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, ()):
            nd = du + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    assert out == dist


def test_sssp_multi_source_and_unreachable(spark):
    from raster2dggs_spark.operators.graph import sssp

    pdf = pd.DataFrame([(1, 2, 5.0), (3, 4, 1.0), (8, 9, 1.0)],
                       columns=["src", "dst", "w"])
    out = {r.node: r.dist for r in sssp(
        spark.createDataFrame(pdf), [1, 3]).collect()}
    # 8, 9 unreachable -> absent; directed: 2 via 1, 4 via 3
    assert out == {1: 0.0, 2: 5.0, 3: 0.0, 4: 1.0}


def test_sssp_round_cap_raises(spark):
    import pytest as _pytest

    from raster2dggs_spark.operators.graph import sssp

    # a 5-chain cannot converge in 2 rounds
    pdf = pd.DataFrame([(i, i + 1, 1.0) for i in range(5)],
                       columns=["src", "dst", "w"])
    with _pytest.raises(RuntimeError, match="converge"):
        sssp(spark.createDataFrame(pdf), [0], max_rounds=2)


def test_label_propagation_two_cliques(spark):
    from raster2dggs_spark.operators.graph import label_propagation

    # two K4 cliques joined by one bridge edge: after enough rounds
    # each clique converges to its min id; the bridge does not merge
    a = [(i, j) for i in range(4) for j in range(4) if i < j]
    b = [(i, j) for i in range(10, 14) for j in range(10, 14) if i < j]
    pdf = pd.DataFrame(a + b + [(3, 10)], columns=["src", "dst"])
    out = {r.vertex: r.community for r in label_propagation(
        spark.createDataFrame(pdf), rounds=6).collect()}
    assert {out[i] for i in range(4)} == {0}
    assert {out[i] for i in range(10, 14)} == {10}


def test_label_propagation_tiebreak_and_isolated(spark):
    from raster2dggs_spark.operators.graph import label_propagation

    # star: leaves 2,3 both see only {1}; hub 1 sees {2:1, 3:1} ->
    # tie -> smallest label 2.  Vertex 9 isolated via self-loop keeps 9
    pdf = pd.DataFrame([(1, 2), (1, 3), (9, 9)], columns=["src", "dst"])
    out = {r.vertex: r.community for r in label_propagation(
        spark.createDataFrame(pdf), rounds=1).collect()}
    assert out[2] == 1 and out[3] == 1 and out[1] == 2
    assert out[9] == 9


def test_label_propagation_multigraph_counts(spark):
    from raster2dggs_spark.operators.graph import label_propagation

    # vertex 5 has TWO parallel edges to 7 and one to 3: label 7 wins
    # by multiplicity even though 3 < 7
    pdf = pd.DataFrame([(5, 7), (5, 7), (5, 3)], columns=["src", "dst"])
    out = {r.vertex: r.community for r in label_propagation(
        spark.createDataFrame(pdf), rounds=1).collect()}
    assert out[5] == 7


def test_sssp_cap_equals_needed_rounds_converges(spark):
    from raster2dggs_spark.operators.graph import sssp

    # 3-chain needs exactly 3 improvement rounds; cap 3 must converge
    pdf = pd.DataFrame([(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)],
                       columns=["src", "dst", "w"])
    st = {}
    out = {r.node: r.dist for r in sssp(
        spark.createDataFrame(pdf), [0], max_rounds=3,
        stats=st).collect()}
    assert out == {0: 0.0, 1: 1.0, 2: 2.0, 3: 3.0}
    assert st["rounds"] == 3


def test_sssp_multi_matches_per_source_runs(spark):
    from raster2dggs_spark.operators.graph import sssp, sssp_multi

    rng = np.random.default_rng(13)
    es = [(int(rng.integers(0, 20)), int(rng.integers(0, 20)),
           float(rng.integers(1, 9))) for _ in range(60)]
    df = spark.createDataFrame(pd.DataFrame(
        es, columns=["src", "dst", "w"]))
    multi = {(r.source, r.node): r.dist
             for r in sssp_multi(df, [0, 5, 11]).collect()}
    for s in (0, 5, 11):
        single = {r.node: r.dist for r in sssp(df, [s]).collect()}
        got = {n: d for (src_, n), d in multi.items() if src_ == s}
        assert got == single, s
