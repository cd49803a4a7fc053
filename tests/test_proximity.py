"""Euclidean distance transform / allocation (operators/proximity.py).

Pinned against a brute-force all-pairs numpy oracle — exact squared
lattice distances and the lex (d2, id) allocation tie-break, on dense
and ragged domains, for both physical strategies.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from raster2dggs_spark.operators.proximity import (
    _column_summary, _edt_rows, euclidean_distance,
)


def _brute(gx, gy, src_mask, sid):
    sx, sy, si = gx[src_mask], gy[src_mask], sid[src_mask]
    if not len(sx):
        return None, None
    D = (gx[:, None] - sx) ** 2 + (gy[:, None] - sy) ** 2
    bd = D.min(axis=1)
    ba = np.array([si[D[i] == bd[i]].min() for i in range(len(gx))])
    return bd, ba


def test_kernel_fuzz_vs_brute_force():
    rng = np.random.default_rng(11)
    for _ in range(120):
        W = int(rng.integers(1, 32))
        H = int(rng.integers(1, 32))
        n = int(rng.integers(1, W * H + 1))
        cells = rng.choice(W * H, size=n, replace=False)
        gx = (cells % W).astype(np.int64)
        gy = (cells // W).astype(np.int64)
        src = rng.random(n) < 0.15
        sid = rng.integers(0, 5, n).astype(np.int64)  # ties likely
        pdf = pd.DataFrame({"gx": gx, "gy": gy, "gprec": 7,
                            "is_src": src, "sid": sid})
        cols, offs, sys, ids = _column_summary(
            pdf[pdf.is_src][["gx", "gy", "sid"]], True)
        out = _edt_rows(pdf, cols, offs, sys, ids, True)
        bd, ba = _brute(gx, gy, src, sid)
        if bd is None:
            assert out.d2.isna().all() and out.alloc.isna().all()
        else:
            assert (out.d2.to_numpy(np.int64) == bd).all()
            assert (out.alloc.to_numpy(np.int64) == ba).all()


def test_kernel_exact_tie_integer_breakpoint():
    # two sources exactly equidistant from the midpoint column: the
    # crossover lands ON an integer; the smaller id must win there
    pdf = pd.DataFrame({
        "gx": np.arange(5, dtype=np.int64), "gy": np.int64(0),
        "gprec": 7,
        "is_src": [True, False, False, False, True],
        "sid": np.array([9, 0, 0, 0, 3], np.int64)})
    cols, offs, sys, ids = _column_summary(
        pdf[pdf.is_src][["gx", "gy", "sid"]], True)
    out = _edt_rows(pdf, cols, offs, sys, ids, True)
    assert list(out.d2) == [0, 1, 4, 1, 0]
    assert list(out.alloc) == [9, 9, 3, 3, 3]   # tie at x=2 -> min id


def _mk_cells(spark, W, H, seed, dggs):
    rng = np.random.default_rng(seed)
    n = W * H
    gx = (np.arange(n) % W).astype(np.int64)
    gy = (np.arange(n) // W).astype(np.int64)
    keep = rng.random(n) < 0.8                   # ragged domain
    gx, gy = gx[keep], gy[keep]
    src = rng.random(len(gx)) < 0.06
    sid = rng.integers(0, 4, len(gx)).astype(np.int64)
    if dggs == "quadkey":
        from raster2dggs_spark.dggs import quadkeylib
        cell = quadkeylib.tile_to_cell(gx + 8, gy + 40, 7)
    else:
        from raster2dggs_spark.dggs import geohashlib
        gx, gy = gx + 100, gy + 500
        cell = np.asarray(geohashlib.cell_from_indices(gx, gy, 5),
                          np.int64)
    pdf = pd.DataFrame({"cell": cell, "is_src": src, "sid": sid,
                        "ux": gx, "uy": gy})
    return spark.createDataFrame(pdf).repartition(7), pdf


@pytest.mark.parametrize("strategy", ["collect", "join"])
@pytest.mark.parametrize("dggs", ["quadkey", "geohash"])
def test_spark_plan_vs_brute_force(spark, strategy, dggs):
    df, pdf = _mk_cells(spark, 20, 16, 5, dggs)
    out = (euclidean_distance(df, "is_src", dggs=dggs, id_col="sid",
                              strategy=strategy)
           .toPandas().sort_values(["uy", "ux"]))
    ref = pdf.sort_values(["uy", "ux"])
    bd, ba = _brute(ref.ux.to_numpy(np.int64), ref.uy.to_numpy(np.int64),
                    ref.is_src.to_numpy(bool), ref.sid.to_numpy(np.int64))
    assert (out.d2.to_numpy(np.int64) == bd).all()
    assert (out.alloc.to_numpy(np.int64) == ba).all()


def test_distance_only_no_id(spark):
    df, pdf = _mk_cells(spark, 12, 12, 9, "quadkey")
    out = euclidean_distance(df, "is_src", dggs="quadkey").toPandas()
    assert "alloc" not in out.columns
    ref = pdf.sort_values(["uy", "ux"])
    bd, _ = _brute(ref.ux.to_numpy(np.int64), ref.uy.to_numpy(np.int64),
                   ref.is_src.to_numpy(bool),
                   np.zeros(len(ref), np.int64))
    got = out.sort_values(["uy", "ux"]).d2.to_numpy(np.int64)
    assert (got == bd).all()


def test_no_sources_all_null(spark):
    df, _ = _mk_cells(spark, 8, 8, 2, "quadkey")
    df = df.withColumn("is_src", F.lit(False))
    for strategy in ("collect", "join"):
        out = euclidean_distance(df, "is_src", dggs="quadkey",
                                 id_col="sid", strategy=strategy).toPandas()
        assert out.d2.isna().all() and out.alloc.isna().all()


def test_forced_collect_guard(spark):
    df, _ = _mk_cells(spark, 10, 10, 3, "quadkey")
    with pytest.raises(ValueError, match="strategy='join'"):
        euclidean_distance(df, "is_src", dggs="quadkey",
                           strategy="collect", broadcast_threshold=0)


def test_auto_switches_to_join(spark):
    # threshold 0 forces auto onto the join path; results must agree
    df, pdf = _mk_cells(spark, 14, 10, 4, "quadkey")
    out = (euclidean_distance(df, "is_src", dggs="quadkey", id_col="sid",
                              strategy="auto", broadcast_threshold=0)
           .toPandas().sort_values(["uy", "ux"]))
    ref = pdf.sort_values(["uy", "ux"])
    bd, ba = _brute(ref.ux.to_numpy(np.int64), ref.uy.to_numpy(np.int64),
                    ref.is_src.to_numpy(bool), ref.sid.to_numpy(np.int64))
    assert (out.d2.to_numpy(np.int64) == bd).all()
    assert (out.alloc.to_numpy(np.int64) == ba).all()


def test_sources_on_distinct_images_interact():
    # EDT is geometric: sources on one image's tile block reach cells on
    # another (unlike 8-connected cost paths) — the gate fixture relies
    # on this being handled globally
    pdf = pd.DataFrame({
        "gx": np.array([0, 40], np.int64),
        "gy": np.array([0, 0], np.int64),
        "gprec": 7,
        "is_src": [True, False],
        "sid": np.array([1, 1], np.int64)})
    cols, offs, sys, ids = _column_summary(
        pdf[pdf.is_src][["gx", "gy", "sid"]], True)
    out = _edt_rows(pdf, cols, offs, sys, ids, True)
    assert list(out.d2) == [0, 1600]
