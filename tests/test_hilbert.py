"""Hilbert clustering keys (functions/hilbert.py)."""

import numpy as np
import pandas as pd
import pytest

from raster2dggs_spark.functions.hilbert import (
    hilbert_cluster, with_hilbert_key,
)


def _xy2d(order, x, y):
    d = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_bijective_continuous_and_exact(spark):
    order = 5
    n = 1 << order
    pdf = pd.DataFrame([(x, y) for x in range(n) for y in range(n)],
                       columns=["gx", "gy"])
    out = (with_hilbert_key(spark.createDataFrame(pdf), "gx", "gy",
                            order).toPandas())
    ref = np.array([_xy2d(order, x, y)
                    for x, y in zip(out.gx, out.gy)])
    assert (out.hkey.to_numpy() == ref).all()
    assert sorted(out.hkey) == list(range(n * n))      # bijection
    o = out.sort_values("hkey").reset_index(drop=True)
    step = o.gx.diff().abs()[1:] + o.gy.diff().abs()[1:]
    assert (step == 1).all()                           # rook-continuous


def test_locality_beats_row_major_for_bbox_pruning(spark):
    # THE clustering property: a bbox query should touch few contiguous
    # key ranges (= few parquet files after a sorted write).  Count the
    # ranges a 4x4 box needs under Hilbert vs row-major keys.
    order = 5
    n = 1 << order
    pdf = pd.DataFrame([(x, y) for x in range(n) for y in range(n)],
                       columns=["gx", "gy"])
    out = (with_hilbert_key(spark.createDataFrame(pdf), "gx", "gy",
                            order).toPandas())
    key = {(r.gx, r.gy): r.hkey for r in out.itertuples()}

    def n_ranges(keys):
        ks = sorted(keys)
        return 1 + sum(1 for a, b in zip(ks, ks[1:]) if b > a + 1)

    rng = np.random.default_rng(0)
    hr, rr = [], []
    for _ in range(60):
        x0 = int(rng.integers(0, n - 4))
        y0 = int(rng.integers(0, n - 4))
        box = [(x, y) for x in range(x0, x0 + 4)
               for y in range(y0, y0 + 4)]
        hr.append(n_ranges([key[p] for p in box]))
        rr.append(n_ranges([y * n + x for x, y in box]))
    assert np.mean(hr) < np.mean(rr)           # fewer ranges = fewer files
    assert np.mean(hr) < 3.9        # row-major needs exactly 4


def test_hilbert_cluster_sorted_output(spark):
    from raster2dggs_spark.dggs import geohashlib

    rng = np.random.default_rng(3)
    gx = rng.integers(0, 256, 400).astype(np.int64)
    gy = rng.integers(0, 128, 400).astype(np.int64)
    cell = np.asarray(geohashlib.cell_from_indices(gx, gy, 3), np.int64)
    df = spark.createDataFrame(pd.DataFrame({"cell": cell})).distinct()
    out = hilbert_cluster(df, dggs="geohash")
    pdf_parts = out.rdd.glom().map(
        lambda rows: [r["hkey"] for r in rows]).collect()
    flat_prev = None
    for part in pdf_parts:                 # sorted within + across
        assert part == sorted(part)
        if part:
            if flat_prev is not None:
                assert flat_prev <= part[0]
            flat_prev = part[-1]


def test_order_validation(spark):
    df = spark.createDataFrame(pd.DataFrame({"gx": [0], "gy": [0]}))
    with pytest.raises(ValueError):
        with_hilbert_key(df, "gx", "gy", 0)
