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
