"""skyline (operators/aggregates.py): Pareto frontier semantics."""


def test_skyline_known_frontier(spark):
    import pandas as pd

    from raster2dggs_spark.operators.aggregates import skyline

    pdf = pd.DataFrame({
        "id": [1, 2, 3, 4, 5],
        "x": [1.0, 2.0, 3.0, 1.0, 5.0],
        "y": [5.0, 3.0, 1.0, 5.0, 5.0],
    })
    # frontier: (1,5) x2 (tie survives), (2,3), (3,1); (5,5) dominated
    out = skyline(spark.createDataFrame(pdf), ["x", "y"],
                  keep_cols=["id"]).collect()
    got = sorted((r.id, r.x, r.y) for r in out)
    assert got == [(1, 1.0, 5.0), (2, 2.0, 3.0), (3, 3.0, 1.0),
                   (4, 1.0, 5.0)]


def test_skyline_groups_isolate(spark):
    import pandas as pd

    from raster2dggs_spark.operators.aggregates import skyline

    # group b's (0,0) must NOT prune group a's rows
    pdf = pd.DataFrame({
        "g": ["a", "a", "b"],
        "x": [1.0, 2.0, 0.0],
        "y": [2.0, 1.0, 0.0],
    })
    out = skyline(spark.createDataFrame(pdf), ["x", "y"],
                  group_cols=["g"]).collect()
    got = sorted((r.g, r.x, r.y) for r in out)
    assert got == [("a", 1.0, 2.0), ("a", 2.0, 1.0), ("b", 0.0, 0.0)]


def test_skyline_vs_bruteforce_random(spark):
    import numpy as np
    import pandas as pd

    from raster2dggs_spark.operators.aggregates import skyline

    rng = np.random.default_rng(9)
    pdf = pd.DataFrame({
        "id": range(300),
        "x": rng.integers(0, 30, 300).astype(float),
        "y": rng.integers(0, 30, 300).astype(float),
        "z": rng.integers(0, 30, 300).astype(float),
    })
    out = {r.id for r in skyline(
        spark.createDataFrame(pdf).repartition(7), ["x", "y", "z"],
        keep_cols=["id"]).collect()}
    arr = pdf[["x", "y", "z"]].to_numpy()
    want = set()
    for i in range(len(arr)):
        dom = ((arr <= arr[i]).all(axis=1)
               & (arr < arr[i]).any(axis=1)).any()
        if not dom:
            want.add(i)
    assert out == want


def test_skyline_large_magnitude_no_sum_rounding(spark):
    import pandas as pd

    from raster2dggs_spark.operators.aggregates import skyline

    # sums of both rows round to the same double (ulp(1e17) = 16) but
    # (1e17, 1.0) strictly dominates (1e17, 2.0) — the lexicographic
    # sort must still evict the dominated row
    pdf = pd.DataFrame({"id": [1, 2],
                        "x": [1e17, 1e17], "y": [2.0, 1.0]})
    out = [r.id for r in skyline(spark.createDataFrame(pdf),
                                 ["x", "y"], keep_cols=["id"]).collect()]
    assert out == [2]


def test_association_rules_known(spark):
    import pandas as pd
    import pytest as _pytest

    from raster2dggs_spark.operators.aggregates import association_rules

    # baskets: {A,B} x3, {A,C} x1, {B} x1, duplicate rows collapse
    rows = [(1, "A"), (1, "B"), (1, "B"),
            (2, "A"), (2, "B"),
            (3, "A"), (3, "B"),
            (4, "A"), (4, "C"),
            (5, "B")]
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["basket", "item"]))
    out = {(r.antecedent, r.consequent): r
           for r in association_rules(df, "basket", "item",
                                      min_support=0.0).collect()}
    ab = out[("A", "B")]
    assert ab.n_joint == 3
    assert ab.support == _pytest.approx(0.6)       # 3 of 5 baskets
    assert ab.confidence == _pytest.approx(0.75)   # A in 4 baskets
    assert ab.lift == _pytest.approx(0.75 / (4 / 5))
    ba = out[("B", "A")]
    assert ba.confidence == _pytest.approx(0.75)   # B in 4 baskets
    assert ("C", "B") not in out                   # never co-occur
    # min_support filter
    out2 = association_rules(df, "basket", "item",
                             min_support=0.5).collect()
    assert {(r.antecedent, r.consequent) for r in out2} == {
        ("A", "B"), ("B", "A")}


def test_layer_correlation_known(spark):
    import numpy as np
    import pandas as pd
    import pytest as _pytest

    from raster2dggs_spark.operators.aggregates import layer_correlation

    rng = np.random.default_rng(3)
    va = rng.normal(0, 1, 200)
    vb = 3.0 * va + rng.normal(0, 0.5, 200)
    a = spark.createDataFrame(pd.DataFrame(
        {"cell": range(200), "va": va}))
    # layer b misses cells 0..49 -> complete-case join on 50..199
    b = spark.createDataFrame(pd.DataFrame(
        {"cell": range(50, 200), "vb": vb[50:]}))
    r = layer_correlation(a, b).collect()[0]
    assert r.n_cells == 150
    want = np.corrcoef(va[50:], vb[50:])[0, 1]
    assert r.pearson_r == _pytest.approx(want, abs=1e-6)
    assert r.covar == _pytest.approx(
        np.cov(va[50:], vb[50:], ddof=1)[0, 1], abs=1e-3)
    assert r.mean_a == _pytest.approx(va[50:].mean(), abs=1e-6)


def test_layer_correlation_perfect_and_anti(spark):
    import pandas as pd
    import pytest as _pytest

    from raster2dggs_spark.operators.aggregates import layer_correlation

    a = spark.createDataFrame(pd.DataFrame(
        {"cell": range(10), "va": [float(i) for i in range(10)]}))
    b_pos = spark.createDataFrame(pd.DataFrame(
        {"cell": range(10), "vb": [2.0 * i + 1 for i in range(10)]}))
    b_neg = spark.createDataFrame(pd.DataFrame(
        {"cell": range(10), "vb": [-i + 5.0 for i in range(10)]}))
    assert layer_correlation(a, b_pos).collect()[0].pearson_r == \
        _pytest.approx(1.0)
    assert layer_correlation(a, b_neg).collect()[0].pearson_r == \
        _pytest.approx(-1.0)


def test_zonal_diversity_known(spark):
    import math

    import pandas as pd
    import pytest as _pytest

    from raster2dggs_spark.operators.aggregates import zonal_diversity

    rows = (
        [(1, "a")] * 5 + [(1, "b")] * 5        # even 2-class zone
        + [(2, "a")] * 9 + [(2, "b")]          # skewed
        + [(3, "a")] * 4                       # single class
        + [(4, None)] * 3 + [(4, "x")]         # nulls excluded
    )
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["zone", "cls"]))
    out = {r.zone: r for r in zonal_diversity(df, "zone",
                                              "cls").collect()}
    z1 = out[1]
    assert (z1.n_cells, z1.richness) == (10, 2)
    assert z1.shannon_h == _pytest.approx(math.log(2), abs=1e-6)
    assert z1.simpson_d == _pytest.approx(0.5)
    assert z1.evenness == _pytest.approx(1.0)
    z2 = out[2]
    want_h = -(0.9 * math.log(0.9) + 0.1 * math.log(0.1))
    assert z2.shannon_h == _pytest.approx(want_h, abs=1e-6)
    assert z2.simpson_d == _pytest.approx(1 - 0.81 - 0.01)
    z3 = out[3]
    assert (z3.richness, z3.shannon_h, z3.simpson_d) == (1, 0.0, 0.0)
    assert z3.evenness is None
    assert out[4].n_cells == 1  # nulls dropped


def test_gini_index_known(spark):
    import pandas as pd
    import pytest as _pytest

    from raster2dggs_spark.operators.aggregates import gini_index

    rows = (
        [(1, 5.0)] * 4                       # perfect equality -> 0
        + [(2, 0.0), (2, 0.0), (2, 0.0), (2, 12.0)]  # near-total conc
        + [(3, 1.0), (3, 2.0), (3, 3.0), (3, 4.0)]
        + [(4, 0.0), (4, 0.0)]               # zero total -> NULL
    )
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["g", "x"]))
    out = {r.g: r for r in gini_index(df, "g", "x").collect()}
    assert out[1].gini == _pytest.approx(0.0, abs=1e-9)
    # one of four holds everything: G = (n-1)/n = 0.75
    assert out[2].gini == _pytest.approx(0.75)
    # 1,2,3,4: G = 2*(1+4+9+16)/(4*10) - 5/4 = 0.25
    assert out[3].gini == _pytest.approx(0.25)
    assert out[4].gini is None


def test_gini_tie_invariance(spark):
    import pandas as pd
    import pytest as _pytest

    from raster2dggs_spark.operators.aggregates import gini_index

    # heavy ties + different input orders/partitionings -> identical G
    pdf = pd.DataFrame({"g": [7] * 9,
                        "x": [2.0, 2.0, 2.0, 5.0, 5.0, 5.0,
                              9.0, 9.0, 9.0]})
    a = gini_index(spark.createDataFrame(pdf), "g", "x").collect()[0]
    b = gini_index(
        spark.createDataFrame(pdf.iloc[::-1]).repartition(5),
        "g", "x").collect()[0]
    assert a.gini == b.gini
