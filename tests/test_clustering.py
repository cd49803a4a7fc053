"""DBSCAN (operators/clustering.py) vs a sequential reference."""

import numpy as np
import pandas as pd

from raster2dggs_spark.operators.clustering import dbscan_points


def _ref_dbscan(lon, lat, ids, eps_m, min_pts):
    """Brute-force reference with the operator's deterministic
    semantics (min-id labels, min-cluster border assignment)."""
    R = 6371007.1809
    la = np.radians(lat)
    lo = np.radians(lon)
    d = 2 * R * np.arcsin(np.sqrt(
        np.sin((la[:, None] - la) / 2) ** 2
        + np.cos(la)[:, None] * np.cos(la)
        * np.sin((lo[:, None] - lo) / 2) ** 2))
    nbr = d <= eps_m
    core = nbr.sum(axis=1) >= min_pts
    n = len(ids)
    # min-id components over core-core edges
    lab = np.where(core, ids, np.iinfo(np.int64).max)
    for _ in range(n):
        new = lab.copy()
        for i in range(n):
            if not core[i]:
                continue
            js = np.where(nbr[i] & core)[0]
            new[i] = min(lab[j] for j in js) if len(js) else lab[i]
        if (new == lab).all():
            break
        lab = new
    cluster = np.full(n, -1, np.int64)
    cluster[core] = lab[core]
    for i in range(n):
        if core[i]:
            continue
        js = np.where(nbr[i] & core)[0]
        if len(js):
            cluster[i] = min(lab[j] for j in js)
    return core, cluster


def test_dbscan_vs_reference(spark):
    rng = np.random.default_rng(23)
    # three dense blobs + scattered noise
    blobs = [(10.0, 10.0), (11.5, 10.2), (40.0, -20.0)]
    lon, lat = [], []
    for bx, by in blobs:
        lon += list(bx + rng.normal(0, 0.15, 12))
        lat += list(by + rng.normal(0, 0.15, 12))
    lon += list(rng.uniform(-170, 170, 10))
    lat += list(rng.uniform(-60, 60, 10))
    lon = np.array(lon)
    lat = np.array(lat)
    ids = np.arange(len(lon), dtype=np.int64) * 7 + 3
    pdf = pd.DataFrame({"point_id": ids, "lon": lon, "lat": lat})
    out = (dbscan_points(spark.createDataFrame(pdf), eps_m=60_000.0,
                         min_pts=4)
           .toPandas().set_index("point_id").sort_index())
    core, cluster = _ref_dbscan(lon, lat, ids, 60_000.0, 4)
    ref = pd.DataFrame({"point_id": ids, "core": core,
                        "cluster": cluster}).set_index(
        "point_id").sort_index()
    assert (out.is_core == ref.core).all()
    got = out.cluster.fillna(-1).astype(np.int64)
    assert (got == ref.cluster).all()
    # sanity: the two nearby blobs merge through the 60 km eps only if
    # bridged — the far blob must be a separate cluster
    assert out.cluster.nunique() >= 2
