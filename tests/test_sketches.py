"""Distinct-count sketches (operators/sketches.py): accuracy vs exact
counts and exactness below k."""

import numpy as np
import pandas as pd
import pytest

from raster2dggs_spark.operators.sketches import hll_distinct, kmv_distinct


def _df(spark, n_groups=3, per_group=(30, 500, 5000), seed=5):
    rng = np.random.default_rng(seed)
    rows = []
    for g, n in enumerate(per_group):
        vals = rng.choice(n * 3, size=n, replace=False)
        for v in vals:
            rows.append((f"g{g}", int(v)))
            if v % 4 == 0:                     # duplicates don't count
                rows.append((f"g{g}", int(v)))
    return (spark.createDataFrame(
        pd.DataFrame(rows, columns=["grp", "val"])),
        dict(zip([f"g{g}" for g in range(n_groups)], per_group)))


def test_kmv_exact_below_k_and_accurate_above(spark):
    df, exact = _df(spark)
    out = (kmv_distinct(df, ["grp"], "val", k=64)
           .toPandas().set_index("grp"))
    # 30 < k: exact
    assert out.loc["g0", "n_hashes"] == 30
    assert out.loc["g0", "est_distinct"] == 30.0
    # 500 and 5000: within ~4 sigma of 1/sqrt(k-2)
    for g in ("g1", "g2"):
        rel = abs(out.loc[g, "est_distinct"] - exact[g]) / exact[g]
        assert rel < 4.0 / np.sqrt(62), (g, rel)


def test_hll_accuracy(spark):
    df, exact = _df(spark)
    out = (hll_distinct(df, ["grp"], "val", p=10)
           .toPandas().set_index("grp"))
    for g, n in exact.items():
        rel = abs(out.loc[g, "est_distinct"] - n) / n
        assert rel < 4 * 1.04 / np.sqrt(1 << 10), (g, rel)


def test_hll_p_validation(spark):
    df, _ = _df(spark, per_group=(10,), n_groups=1)
    with pytest.raises(ValueError):
        hll_distinct(df, ["grp"], "val", p=2)


def test_cms_overestimates_and_is_tight_when_wide(spark):
    import pandas as pd

    from raster2dggs_spark.operators.sketches import cms_frequencies

    rng = np.random.default_rng(7)
    # zipf-ish stream over 200 keys
    keys = rng.zipf(1.5, 20000) % 200
    df = spark.createDataFrame(
        pd.DataFrame({"v": keys.astype("int64")}))
    truth = pd.Series(keys).value_counts()
    cands = spark.createDataFrame(
        pd.DataFrame({"value": truth.index[:20].astype("int64")}))
    est = (cms_frequencies(df, "v", cands, width=4096, depth=4)
           .toPandas().set_index("value").est_count)
    for k in truth.index[:20]:
        t = truth[k]
        assert est[k] >= t                     # CMS never undercounts
        assert est[k] <= t + 2 * len(keys) / 4096 + 1


def test_cms_absent_key_zero_when_no_collision(spark):
    import pandas as pd

    from raster2dggs_spark.operators.sketches import cms_frequencies

    df = spark.createDataFrame(pd.DataFrame({"v": ["a", "b", "a"]}))
    cands = spark.createDataFrame(
        pd.DataFrame({"value": ["a", "b", "zzz"]}))
    est = (cms_frequencies(df, "v", cands, width=65536, depth=4)
           .toPandas().set_index("value").est_count)
    assert est["a"] == 2 and est["b"] == 1 and est["zzz"] == 0
