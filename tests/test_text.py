"""edit_distance_join — PassJoin blocking pinned against brute force."""

import pytest


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.mark.parametrize("max_d", [1, 2])
def test_edit_distance_join_matches_brute(spark, max_d):
    import numpy as np

    from raster2dggs_spark.operators.text import edit_distance_join

    rng = np.random.RandomState(13)
    strs = ["", "a", "b", "ab", "ba"]
    for _ in range(120):
        n = rng.randint(0, 7)
        strs.append("".join("abc"[k] for k in rng.randint(0, 3, n)))
    rows = [(i, s) for i, s in enumerate(strs)]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {(r.id_a, r.id_b, r.dist)
           for r in edit_distance_join(df, "s", "id", max_d).collect()}
    exp = set()
    for i in range(len(strs)):
        for j in range(i + 1, len(strs)):
            d = _lev(strs[i], strs[j])
            if d <= max_d:
                exp.add((i, j, d))
    assert got == exp
    assert len(exp) > 50  # the fixture actually exercises matches


def test_edit_distance_join_long_strings(spark):
    from raster2dggs_spark.operators.text import edit_distance_join

    rows = [(1, "internationalization"), (2, "internationalisation"),
            (3, "internationalizations"), (4, "completelydifferent"),
            (5, "internationalization")]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {(r.id_a, r.id_b, r.dist)
           for r in edit_distance_join(df, "s", "id", 1).collect()}
    assert got == {(1, 2, 1), (1, 3, 1), (1, 5, 0), (2, 5, 1), (3, 5, 1)}


def test_edit_distance_join_bad_d(spark):
    from raster2dggs_spark.operators.text import edit_distance_join

    df = spark.createDataFrame([(1, "x")], "id long, s string")
    with pytest.raises(ValueError, match="max_d"):
        edit_distance_join(df, "s", "id", 0)
