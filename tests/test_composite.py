"""Multi-scene compositing (operators/composite.py).

Strategy semantics on hand-built frames + end-to-end invariants on the
deterministic scene stack (the gate fixture's generator)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from raster2dggs_spark.operators.composite import (
    composite_cells, composite_scenes, scene_cell_means,
)


def _stack(spark):
    """3 scenes x 2 cells; scene s2 has the best quality on cell 10,
    s0/s1 tie on cell 20's quality (tie broken by ts then scene id)."""
    rows = [
        # (scene, ts, cell, quality, v)
        ("s0", 100, 10, 5.0, 1.0),
        ("s1", 200, 10, 7.0, 2.0),
        ("s2", 300, 10, 9.0, 3.0),
        ("s0", 100, 20, 4.0, 10.0),
        ("s1", 200, 20, 4.0, 20.0),
        ("s2", 300, 20, 1.0, 30.0),
    ]
    return spark.createDataFrame(
        rows, "image_id string, scene_ts long, cell long, quality double, v double")


def test_best_quality_picks_argmax_and_breaks_ties_by_time(spark):
    out = composite_cells(_stack(spark), ["v"], strategy="best_quality")
    got = {r["cell"]: (r["scene"], r["v"], r["n_scenes"]) for r in out.collect()}
    assert got[10] == ("s2", 3.0, 3)
    # quality tie 4.0/4.0 between s0 and s1 -> later ts (s1) wins
    assert got[20] == ("s1", 20.0, 3)


def test_latest_ignores_quality(spark):
    out = composite_cells(_stack(spark), ["v"], strategy="latest")
    got = {r["cell"]: r["scene"] for r in out.collect()}
    assert got == {10: "s2", 20: "s2"}


def test_median_and_mean(spark):
    out = composite_cells(_stack(spark), ["v"], strategy="median").collect()
    med = {r["cell"]: r["v"] for r in out}
    assert med == {10: 2.0, 20: 20.0}
    avg = {r["cell"]: r["v"]
           for r in composite_cells(_stack(spark), ["v"], strategy="mean").collect()}
    assert avg == {10: 2.0, 20: 20.0}


def test_unknown_strategy_raises(spark):
    with pytest.raises(ValueError, match="strategy"):
        composite_cells(_stack(spark), ["v"], strategy="best")


def test_quality_rounded_before_argmax(spark):
    """Sub-1e-4 quality differences must NOT decide the winner (cross-
    engine float-stability rule) — the total tie-break (ts) must."""
    rows = [("a", 100, 1, 5.00001, 1.0), ("b", 200, 1, 5.00004, 2.0)]
    df = spark.createDataFrame(
        rows, "image_id string, scene_ts long, cell long, quality double, v double")
    out = composite_cells(df, ["v"], strategy="best_quality").collect()
    assert out[0]["scene"] == "b"  # equal after round(,4) -> later ts


def test_scene_cell_means_nan_aware(spark):
    rows = [("s0", 1, 1.0, float("nan")), ("s0", 1, 3.0, 8.0)]
    df = spark.createDataFrame(rows, "image_id string, cell long, b1 double, b2 double")
    r = scene_cell_means(df, ["b1", "b2"]).collect()[0]
    assert r["b1"] == 2.0 and r["b2"] == 8.0 and r["n_px"] == 2


def test_composite_scenes_end_to_end(spark):
    """Full pipeline on the gate generator: every cell is covered by
    exactly `epochs` scenes (identical epoch geometry), the winner's QA
    dominates the per-cell stack, and provenance survives."""
    from raster2dggs_spark.sources.images import (
        IMAGE_SCHEMA, generate_scene_stack_pdf,
    )
    from raster2dggs_spark.operators.indexing import pixel_cells

    images, meta = generate_scene_stack_pdf(3, epochs=3, seed=11)
    imgs = spark.createDataFrame(images, IMAGE_SCHEMA)
    m = spark.createDataFrame(meta[["image_id", "scene_ts"]])
    out = composite_scenes(imgs, m, res=6, strategy="best_quality",
                           quality_band="band_4").cache()
    rows = out.collect()
    assert rows and all(r["n_scenes"] == 3 for r in rows)

    # independent check: recompute the per-(scene, cell) QA means and
    # assert the chosen scene holds the max (after the 4dp round)
    px = pixel_cells(imgs, res=6, keep_image_id=True)
    qa = (px.groupBy("image_id", "cell").agg(F.avg("band_4").alias("qa"))
            .collect())
    best = {}
    for r in qa:
        cur = best.get(r["cell"])
        if cur is None or round(r["qa"], 4) > round(cur, 4):
            best[r["cell"]] = r["qa"]
    for r in rows:
        assert round(r["quality"], 4) == round(best[r["cell"]], 4)
    out.unpersist()


def test_stack_generator_deterministic_and_integer_valued():
    from raster2dggs_spark.codecs import decode_image
    from raster2dggs_spark.sources.images import generate_scene_stack_pdf

    a_img, a_meta = generate_scene_stack_pdf(2, epochs=2, seed=5)
    b_img, _ = generate_scene_stack_pdf(2, epochs=2, seed=5)
    assert (a_img["bytes"] == b_img["bytes"]).all()
    # identical geometry across epochs of one footprint
    g0 = a_img[a_img.image_id.str.startswith("img_scene_0000")]
    assert g0[["affine_a", "affine_c", "affine_f", "w", "h"]].nunique().max() == 1
    arr = decode_image(bytes(a_img["bytes"].iloc[0]))
    assert np.all(arr == np.round(arr))  # integer-exact means downstream


# ---------------------------------------------------------------- change


def _change_stack(spark):
    """Hand-built per-(scene, cell) rows covering every change class.
    t_break = 150: ts 100 is before, ts 200/300 after."""
    rows = [
        # gain: before 10, after mean 20 (rel 1.0)
        ("s0", 100, 1, 10.0), ("s1", 200, 1, 15.0), ("s2", 300, 1, 25.0),
        # loss: before 10, after 5
        ("s0", 100, 2, 10.0), ("s1", 200, 2, 5.0),
        # stable: before 100, after 105 (rel 0.05 <= 0.1)
        ("s0", 100, 3, 100.0), ("s1", 200, 3, 105.0),
        # new: no before observation
        ("s1", 200, 4, 7.0),
        # gone: no after observation
        ("s0", 100, 5, 7.0),
        # zero before, positive after -> gain via the sign path
        ("s0", 100, 6, 0.0), ("s1", 200, 6, 2.0),
        # zero before, zero after -> stable via the equality path
        ("s0", 100, 7, 0.0), ("s1", 200, 7, 0.0),
        # boundary: rel exactly 0.1 classifies stable (<=)
        ("s0", 100, 8, 10.0), ("s1", 200, 8, 11.0),
    ]
    return spark.createDataFrame(
        rows, "image_id string, scene_ts long, cell long, v double")


def test_change_cells_classes(spark):
    from raster2dggs_spark.operators.composite import change_cells

    out = change_cells(_change_stack(spark), ["v"], t_break=150)
    got = {r["cell"]: r.asDict() for r in out.collect()}
    assert got[1]["v_class"] == "gain" and got[1]["v_delta"] == 10.0
    assert got[2]["v_class"] == "loss" and got[2]["v_delta"] == -5.0
    assert got[3]["v_class"] == "stable"
    assert got[4]["v_class"] == "new" and got[4]["v_before"] is None
    assert got[4]["n_before"] == 0 and got[4]["n_after"] == 1
    assert got[5]["v_class"] == "gone" and got[5]["v_after"] is None
    assert got[6]["v_class"] == "gain"
    assert got[7]["v_class"] == "stable"
    assert got[8]["v_class"] == "stable"  # rel == threshold is stable


def test_change_cells_single_exchange(spark):
    """The plan must be ONE aggregation over the input — no self-join
    (two exchanges of the same source) hiding in the conditional
    aggregates."""
    from raster2dggs_spark.operators.composite import change_cells

    out = change_cells(_change_stack(spark), ["v"], t_break=150)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_change_cells_multi_column_and_threshold(spark):
    from raster2dggs_spark.operators.composite import change_cells

    rows = [("s0", 100, 1, 10.0, 50.0), ("s1", 200, 1, 13.0, 51.0)]
    df = spark.createDataFrame(
        rows, "image_id string, scene_ts long, cell long, a double, b double")
    out = change_cells(df, ["a", "b"], t_break=150, rel_threshold=0.2).collect()[0]
    assert out["a_class"] == "gain"      # rel 0.3 > 0.2
    assert out["b_class"] == "stable"    # rel 0.02


def test_trend_cells_exact_ols(spark):
    from raster2dggs_spark.operators.composite import trend_cells

    rows = [
        # cell 1: y = 2x + 5 exactly -> slope 2, intercept 5, r2 1
        ("s0", 0, 1, 5.0), ("s1", 1, 1, 7.0), ("s2", 2, 1, 9.0),
        # cell 2: y = (0, 1, 0) -> slope 0, intercept 1/3, r2 0
        ("s0", 0, 2, 0.0), ("s1", 1, 2, 1.0), ("s2", 2, 2, 0.0),
        # cell 3: a NULL observation is skipped (SQL-standard regr_*)
        ("s0", 0, 3, 1.0), ("s1", 1, 3, None), ("s2", 2, 3, 3.0),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, epoch int, cell long, v double")
    got = {r["cell"]: r for r in
           trend_cells(df, ["v"], x_col="epoch").collect()}
    assert got[1]["v_slope"] == pytest.approx(2.0)
    assert got[1]["v_intercept"] == pytest.approx(5.0)
    assert got[1]["v_r2"] == pytest.approx(1.0)
    assert got[2]["v_slope"] == pytest.approx(0.0)
    assert got[2]["v_r2"] == pytest.approx(0.0, abs=1e-12)
    # cell 3: two points (x=0,2) -> slope (3-1)/2 = 1, n_obs counts rows
    assert got[3]["v_slope"] == pytest.approx(1.0)
    assert got[3]["n_obs"] == 3


def test_anomaly_cells(spark):
    from raster2dggs_spark.operators.composite import anomaly_cells

    rows = [("s0", 1, 10.0), ("s1", 1, 20.0), ("s2", 1, 30.0),
            ("s0", 2, 5.0), ("s1", 2, 5.0)]  # constant stack -> NULL z
    df = spark.createDataFrame(rows, "image_id string, cell long, v double")
    got = {(r["cell"], r["image_id"]): r["v_z"]
           for r in anomaly_cells(df, ["v"]).collect()}
    assert got[(1, "s1")] == pytest.approx(0.0)
    assert got[(1, "s2")] == pytest.approx(1.0)   # (30-20)/10
    assert got[(2, "s0")] is None                 # std = 0


def test_interpolate_gaps_semantics(spark):
    from raster2dggs_spark.operators.composite import interpolate_gaps

    rows = [
        # cell 1: observed at 0 and 2 -> x=1 midpoint
        (1, 0, 10.0), (1, 2, 30.0),
        # cell 2: observed only at 1 -> constant everywhere
        (2, 1, 7.0),
    ]
    df = spark.createDataFrame(rows, "cell long, epoch int, v double")
    got = {(r["cell"], r["epoch"]): r["v"]
           for r in interpolate_gaps(df, ["v"], xs=[0, 1, 2]).collect()}
    assert got[(1, 0.0)] == 10.0
    assert got[(1, 1.0)] == 20.0     # linear interior
    assert got[(1, 2.0)] == 30.0
    assert got[(2, 0.0)] == 7.0      # constant edges
    assert got[(2, 2.0)] == 7.0


def test_rolling_cells_range_frame(spark):
    from raster2dggs_spark.operators.composite import rolling_cells

    rows = [(1, 0, 10.0), (1, 1, 20.0), (1, 3, 40.0)]  # gap at x=2
    df = spark.createDataFrame(rows, "cell long, epoch int, v double")
    got = {r["epoch"]: r for r in
           rolling_cells(df, ["v"], window=1).collect()}
    assert got[0]["v_smooth"] == 15.0 and got[0]["n_in_window"] == 2
    assert got[1]["v_smooth"] == 15.0 and got[1]["n_in_window"] == 2
    # x=3: RANGE frame sees only itself (x=2 absent, x=1 out of range)
    assert got[3]["v_smooth"] == 40.0 and got[3]["n_in_window"] == 1
    with pytest.raises(ValueError):
        rolling_cells(df, ["v"], window=1.5)


def test_harmonic_fit_recovers_known_signal(spark):
    """Noiseless synthetic harmonic is recovered exactly (to the 4dp
    edge rounding); coefficients match numpy lstsq on a noisy stack;
    a singular design (single epoch) yields NULL coefficients."""
    import numpy as np

    from raster2dggs_spark.operators.composite import harmonic_fit_cells

    w = 2.0 * np.pi / 12.0
    rows = []
    rng = np.random.default_rng(3)
    truth = {0: (5.0, 2.0, -1.0), 1: (-3.0, 0.5, 4.0)}
    noisy = {}
    for cell, (a0, a1, b1) in truth.items():
        for t in range(24):
            rows.append((cell, t, float(a0 + a1 * np.cos(w * t)
                                        + b1 * np.sin(w * t))))
    ts = np.arange(24)
    for cell in (2, 3):
        v = rng.normal(0, 1, 24) + 10.0 + 3.0 * np.cos(w * ts)
        noisy[cell] = v
        rows += [(cell, int(t), float(v[t])) for t in ts]
    rows += [(9, 0, 1.0), (9, 0, 2.0)]  # singular: one distinct epoch
    df = spark.createDataFrame(rows, "cell int, ts int, v double")
    out = {r.cell: r for r in
           harmonic_fit_cells(df, ["v"], t_col="ts").collect()}
    for cell, (a0, a1, b1) in truth.items():
        r = out[cell]
        assert abs(r.v_a0 - a0) < 1e-3 and abs(r.v_a1 - a1) < 1e-3
        assert abs(r.v_b1 - b1) < 1e-3
        assert abs(r.v_amp - np.hypot(a1, b1)) < 1e-3
        assert abs(r.v_phase - np.arctan2(b1, a1)) < 1e-3
    for cell, v in noisy.items():
        X = np.column_stack([np.ones(24), np.cos(w * ts), np.sin(w * ts)])
        beta = np.linalg.lstsq(X, v, rcond=None)[0]
        r = out[cell]
        assert abs(r.v_a0 - beta[0]) < 1e-3
        assert abs(r.v_a1 - beta[1]) < 1e-3
        assert abs(r.v_b1 - beta[2]) < 1e-3
    assert out[9].v_a0 is None and out[9].n_obs == 2


def test_robust_trend_known_series(spark):
    import pandas as pd
    import pytest as _pytest

    from raster2dggs_spark.operators.composite import robust_trend_cells

    # cell 1: strictly increasing slope-2 line -> sen=2, S = 10 (all
    # positive over C(5,2) pairs), no ties
    rows = [(1, float(t), 2.0 * t + 3.0) for t in range(5)]
    # cell 2: constant -> sen 0, S 0, all values tied -> var_s 0 -> z null
    rows += [(2, float(t), 7.0) for t in range(4)]
    # cell 3: one outlier cannot break the Theil-Sen median (6 of the
    # 10 pair slopes are 1, so the interpolated median stays 1)
    rows += [(3, 0.0, 0.0), (3, 1.0, 1.0), (3, 2.0, 2.0),
             (3, 3.0, 3.0), (3, 4.0, 1000.0)]
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["cell", "scene_ts", "v"]))
    out = {r.cell: r for r in robust_trend_cells(df).collect()}
    r1 = out[1]
    assert (r1.n_obs, r1.n_pairs, r1.mk_s) == (5, 10, 10)
    assert r1.sen_slope == _pytest.approx(2.0)
    # z = (10-1)/sqrt(5*4*15/18) = 9/sqrt(16.666..)
    assert r1.mk_z == _pytest.approx(9.0 / (5 * 4 * 15 / 18.0) ** 0.5)
    r2 = out[2]
    assert r2.sen_slope == 0.0 and r2.mk_s == 0 and r2.mk_z is None
    r3 = out[3]
    assert r3.sen_slope == _pytest.approx(1.0)  # outlier resisted
    assert r3.mk_s == 10


def test_robust_trend_vs_numpy_random(spark):
    import numpy as np
    import pandas as pd
    import pytest as _pytest

    from raster2dggs_spark.operators.composite import robust_trend_cells

    rng = np.random.default_rng(5)
    rows = []
    for cell in range(6):
        for t in range(10):
            rows.append((cell, float(t),
                         float(rng.integers(0, 8))))  # ties likely
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["cell", "scene_ts", "v"]))
    out = {r.cell: r for r in robust_trend_cells(df).collect()}
    data = {}
    for cell, t, v in rows:
        data.setdefault(cell, []).append((t, v))
    for cell, obs in data.items():
        slopes, s = [], 0
        for i in range(len(obs)):
            for jj in range(i + 1, len(obs)):
                (xi, vi), (xj, vj) = obs[i], obs[jj]
                slopes.append((vj - vi) / (xj - xi))
                s += (vj > vi) - (vj < vi)
        n = len(obs)
        _, counts = np.unique([v for _, v in obs], return_counts=True)
        var_s = (n * (n - 1) * (2 * n + 5)
                 - sum(t * (t - 1) * (2 * t + 5)
                       for t in counts)) / 18.0
        r = out[cell]
        assert r.sen_slope == _pytest.approx(
            float(np.percentile(slopes, 50)), rel=1e-12)
        assert r.mk_s == s
        if var_s > 0:
            want = ((s - 1) if s > 0 else (s + 1) if s < 0
                    else 0) / np.sqrt(var_s) if s != 0 else 0.0
            assert r.mk_z == _pytest.approx(want, rel=1e-12)


def test_robust_trend_single_epoch_emits_null(spark):
    import pandas as pd

    from raster2dggs_spark.operators.composite import robust_trend_cells

    rows = [(1, 0.0, 5.0), (1, 0.0, 6.0),   # one distinct x, 2 obs
            (2, 0.0, 1.0), (2, 1.0, 2.0)]   # normal key
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["cell", "scene_ts", "v"]))
    out = {r.cell: r for r in robust_trend_cells(df).collect()}
    assert set(out) == {1, 2}                # key 1 NOT dropped
    assert out[1].sen_slope is None and out[1].mk_z is None
    assert out[1].n_obs == 2
    assert out[2].sen_slope == 1.0
