"""glcm_texture: Haralick features vs a dense NumPy GLCM reference."""

import numpy as np
import pandas as pd
import pytest

from raster2dggs_spark.operators.aggregates import glcm_texture


def _numpy_glcm_features(img, levels, lo, hi, dx, dy):
    """Dense reference: symmetric normalized GLCM + the six features.
    ``img`` is 2-D float with NaN holes."""
    h, w = img.shape
    g = np.clip(np.floor((img - lo) / (hi - lo) * levels), 0,
                levels - 1)
    cm = np.zeros((levels, levels))
    for y in range(h):
        for x in range(w):
            x2, y2 = x + dx, y + dy
            if not (0 <= x2 < w and 0 <= y2 < h):
                continue
            a, b = g[y, x], g[y2, x2]
            if np.isnan(a) or np.isnan(b):
                continue
            cm[int(a), int(b)] += 1
            cm[int(b), int(a)] += 1
    n = cm.sum()
    p = cm / n
    i, j = np.meshgrid(np.arange(levels), np.arange(levels),
                       indexing="ij")
    feats = {
        "n_pairs": int(n),
        "contrast": (p * (i - j) ** 2).sum(),
        "dissimilarity": (p * np.abs(i - j)).sum(),
        "homogeneity": (p / (1.0 + (i - j) ** 2)).sum(),
        "energy": np.sqrt((p ** 2).sum()),
    }
    nz = p[p > 0]
    feats["entropy"] = float(-(nz * np.log(nz)).sum())
    mu_i = (p * i).sum()
    mu_j = (p * j).sum()
    var_i = (p * i * i).sum() - mu_i ** 2
    var_j = (p * j * j).sum() - mu_j ** 2
    den = np.sqrt(var_i) * np.sqrt(var_j)
    feats["correlation"] = (
        ((p * i * j).sum() - mu_i * mu_j) / den if den > 0 else None)
    return feats


def _to_df(spark, img, iid=0):
    h, w = img.shape
    rows = [(iid, x, y, float(img[y, x]))
            for y in range(h) for x in range(w)
            if not np.isnan(img[y, x])]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["img", "x", "y", "z"]))


def test_glcm_vs_numpy_random(spark):
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 10, size=(12, 14))
    img[rng.random(img.shape) < 0.1] = np.nan  # holes
    df = _to_df(spark, img)
    for dx, dy in ((1, 0), (0, 1)):
        out = (glcm_texture(df, "z", levels=6, lo=0.0, hi=10.0,
                            offsets=[(dx, dy)])
               .collect()[0])
        want = _numpy_glcm_features(img, 6, 0.0, 10.0, dx, dy)
        assert out.n_pairs == want["n_pairs"]
        for k in ("contrast", "dissimilarity", "homogeneity",
                  "energy", "entropy", "correlation"):
            assert getattr(out, k) == pytest.approx(want[k],
                                                    rel=1e-9), (dx, k)


def test_glcm_constant_image_null_correlation(spark):
    img = np.full((6, 6), 3.0)
    out = glcm_texture(_to_df(spark, img), "z", levels=4, lo=0.0,
                       hi=8.0, offsets=[(1, 0)]).collect()[0]
    assert out.contrast == 0.0
    assert out.energy == pytest.approx(1.0)
    assert out.entropy == pytest.approx(0.0, abs=1e-12)
    assert out.correlation is None  # zero marginal variance


def test_glcm_checkerboard(spark):
    # perfect 2-level checkerboard: every neighbour pair is (0,1) or
    # (1,0) -> contrast 1, homogeneity 0.5, energy sqrt(0.5),
    # correlation -1
    img = np.indices((8, 8)).sum(axis=0) % 2 * 10.0
    out = glcm_texture(_to_df(spark, img), "z", levels=2, lo=0.0,
                       hi=11.0, offsets=[(1, 0)]).collect()[0]
    assert out.contrast == pytest.approx(1.0)
    assert out.homogeneity == pytest.approx(0.5)
    assert out.energy == pytest.approx(np.sqrt(0.5))
    assert out.correlation == pytest.approx(-1.0)


def test_glcm_multi_group_and_offsets(spark):
    rng = np.random.default_rng(11)
    a = rng.uniform(0, 5, (6, 6))
    b = rng.uniform(0, 5, (6, 6))
    df = _to_df(spark, a, 0).unionByName(_to_df(spark, b, 1))
    out = glcm_texture(df, "z", levels=4, lo=0.0, hi=5.0,
                       offsets=[(1, 0), (0, 1), (1, 1)])
    rows = out.collect()
    assert len(rows) == 6  # 2 groups x 3 offsets
    for r in rows:
        img = a if r.img == 0 else b
        want = _numpy_glcm_features(img, 4, 0.0, 5.0, r.dx, r.dy)
        assert r.contrast == pytest.approx(want["contrast"], rel=1e-9)
