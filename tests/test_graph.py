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
