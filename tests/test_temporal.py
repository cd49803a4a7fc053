"""as-of + range joins — semantics pinned against brute-force references."""

import datetime as dt

import pandas as pd
import pytest

from raster2dggs_spark.operators.temporal import asof_join, range_join

T0 = dt.datetime(2024, 1, 1)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


def _brute(left, right, direction="backward", tolerance_s=None):
    """Reference: for each left row, scan all right rows of the key."""
    out = []
    for (k, t) in left:
        cands = []
        for (rk, rt, v, tb) in right:
            if rk != k:
                continue
            dtu = (t - rt).total_seconds()
            if direction == "forward":
                dtu = -dtu
            if dtu < 0:
                continue
            if tolerance_s is not None and dtu > tolerance_s:
                continue
            cands.append((dtu, -tb, rt, v))
        if not cands:
            out.append((k, t, None, None))
        else:
            cands.sort()
            _, _, rt, v = cands[0]
            out.append((k, t, rt, v))
    return sorted(out, key=lambda r: (r[0], r[1]))


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_brute(spark, direction):
    left = [(1, _ts(10)), (1, _ts(25)), (1, _ts(4)), (2, _ts(50)),
            (2, _ts(0)), (3, _ts(7)), (1, _ts(30))]
    right = [(1, _ts(10), 100.0, 1), (1, _ts(20), 200.0, 2),
             (1, _ts(5), 50.0, 3), (2, _ts(49), 490.0, 4),
             (2, _ts(51), 510.0, 5), (9, _ts(1), 999.0, 6)]
    l = spark.createDataFrame(left, "user_id long, ts timestamp")
    r = spark.createDataFrame(
        right, "user_id long, ts timestamp, price double, seq long")
    got = asof_join(l, r, on="ts", by=["user_id"], value_cols=["price"],
                    tiebreak="seq", direction=direction)
    rows = sorted(
        [(x.user_id, x.ts, x.matched_ts, x.price) for x in got.collect()],
        key=lambda t: (t[0], t[1]))
    assert rows == _brute(left, right, direction)


def test_asof_equal_ts_inclusive_and_tiebreak(spark):
    # right row at EXACTLY the left ts matches; duplicate right rows at
    # one instant resolve to the largest tiebreak.
    l = spark.createDataFrame([(1, _ts(10))], "k long, ts timestamp")
    r = spark.createDataFrame(
        [(1, _ts(10), 1.0, 1), (1, _ts(10), 2.0, 2), (1, _ts(3), 9.0, 3)],
        "k long, ts timestamp, v double, seq long")
    got = asof_join(l, r, on="ts", by=["k"], value_cols=["v"],
                    tiebreak="seq").collect()
    assert len(got) == 1 and got[0].v == 2.0 and got[0].matched_ts == _ts(10)


def test_asof_tolerance(spark):
    l = spark.createDataFrame([(1, _ts(100)), (1, _ts(12))],
                              "k long, ts timestamp")
    r = spark.createDataFrame([(1, _ts(10), 7.0, 1)],
                              "k long, ts timestamp, v double, seq long")
    got = asof_join(l, r, on="ts", by=["k"], value_cols=["v"],
                    tiebreak="seq", tolerance_s=5.0)
    rows = {x.ts: x.v for x in got.collect()}
    assert rows[_ts(12)] == 7.0 and rows[_ts(100)] is None


def test_asof_left_columns_survive(spark):
    l = spark.createDataFrame([(1, _ts(10), "a")],
                              "k long, ts timestamp, tag string")
    r = spark.createDataFrame([(1, _ts(5), 3.0, 1)],
                              "k long, ts timestamp, v double, seq long")
    got = asof_join(l, r, on="ts", by=["k"], value_cols=["v"], tiebreak="seq")
    assert got.columns == ["k", "ts", "tag", "matched_ts", "v"]
    assert got.collect()[0].tag == "a"


def test_asof_name_collision_suffix(spark):
    # a carried right column that collides with a left name gets _right
    l = spark.createDataFrame([(1, _ts(10), 5.0)],
                              "k long, ts timestamp, v double")
    r = spark.createDataFrame([(1, _ts(5), 3.0, 1)],
                              "k long, ts timestamp, v double, seq long")
    got = asof_join(l, r, on="ts", by=["k"], value_cols=["v"], tiebreak="seq")
    assert "v_right" in got.columns
    row = got.collect()[0]
    assert row.v == 5.0 and row.v_right == 3.0


def test_asof_vs_pandas_merge_asof_random(spark):
    import numpy as np
    rng = np.random.RandomState(7)
    lt = [(int(k), _ts(int(s))) for k, s in
          zip(rng.randint(0, 5, 200), rng.randint(0, 10_000, 200))]
    # unique right instants per key so pandas merge_asof is unambiguous
    seen = set()
    rt = []
    i = 0
    for k, s in zip(rng.randint(0, 5, 300), rng.randint(0, 10_000, 300)):
        if (int(k), int(s)) in seen:
            continue
        seen.add((int(k), int(s)))
        rt.append((int(k), _ts(int(s)), float(i), i))
        i += 1
    l = spark.createDataFrame(lt, "k long, ts timestamp")
    r = spark.createDataFrame(rt, "k long, ts timestamp, v double, seq long")
    got = asof_join(l, r, on="ts", by=["k"], value_cols=["v"], tiebreak="seq")
    gp = (got.toPandas().sort_values(["k", "ts", "v"])
          .reset_index(drop=True)[["k", "ts", "v"]])
    lp = pd.DataFrame(lt, columns=["k", "ts"]).sort_values("ts")
    rp = pd.DataFrame(rt, columns=["k", "ts", "v", "seq"]).sort_values("ts")
    exp = (pd.merge_asof(lp, rp[["k", "ts", "v"]], on="ts", by="k")
           .sort_values(["k", "ts", "v"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(gp, exp[["k", "ts", "v"]])


def _brute_range(points, intervals, how="inner"):
    """(pid, iid) matched pairs: start <= t < end, same key."""
    out = set()
    unmatched = set()
    for (pk, pt, pid) in points:
        hit = False
        for (ik, s, e, iid) in intervals:
            if ik == pk and s <= pt < e:
                out.add((pid, iid))
                hit = True
        if not hit:
            unmatched.add(pid)
    if how == "left":
        out |= {(pid, None) for pid in unmatched}
    return out


@pytest.mark.parametrize("how", ["inner", "left"])
@pytest.mark.parametrize("bucket_s", [1.0, 7.0, 1000.0])
def test_range_join_matches_brute(spark, how, bucket_s):
    import numpy as np
    rng = np.random.RandomState(11)
    points = [(int(k), _ts(int(t)), i) for i, (k, t) in
              enumerate(zip(rng.randint(0, 4, 120),
                            rng.randint(0, 500, 120)))]
    intervals = []
    for i, (k, s, ln) in enumerate(zip(rng.randint(0, 4, 60),
                                       rng.randint(0, 500, 60),
                                       rng.randint(0, 40, 60))):
        intervals.append((int(k), _ts(int(s)), _ts(int(s + ln)), i))
    l = spark.createDataFrame(points, "k long, ts timestamp, pid long")
    r = spark.createDataFrame(
        intervals, "k long, start_ts timestamp, end_ts timestamp, iid long")
    got = range_join(l, r, on="ts", by=["k"], bucket_s=bucket_s, how=how)
    pairs = {(x.pid, x.iid) for x in got.collect()}
    assert pairs == _brute_range(points, intervals, how)


def test_range_join_boundaries(spark):
    # start inclusive, end exclusive; zero-length interval matches nothing
    l = spark.createDataFrame(
        [(1, _ts(10), 0), (1, _ts(20), 1), (1, _ts(15), 2)],
        "k long, ts timestamp, pid long")
    r = spark.createDataFrame(
        [(1, _ts(10), _ts(20), 0), (1, _ts(15), _ts(15), 1)],
        "k long, start_ts timestamp, end_ts timestamp, iid long")
    got = {(x.pid, x.iid)
           for x in range_join(l, r, by=["k"], bucket_s=3.0).collect()}
    assert got == {(0, 0), (2, 0)}


def test_range_join_no_key(spark):
    l = spark.createDataFrame([(_ts(5), 0)], "ts timestamp, pid long")
    r = spark.createDataFrame([(_ts(0), _ts(10), 7)],
                              "start_ts timestamp, end_ts timestamp, iid long")
    got = range_join(l, r, bucket_s=2.0).collect()
    assert len(got) == 1 and got[0].iid == 7


def test_range_join_guards(spark):
    l = spark.createDataFrame([(_ts(5), 0)], "ts timestamp, pid long")
    r = spark.createDataFrame([(_ts(0), _ts(10_000), 7)],
                              "start_ts timestamp, end_ts timestamp, iid long")
    with pytest.raises(Exception, match="raise bucket_s"):
        range_join(l, r, bucket_s=1.0, max_buckets_per_interval=10).collect()
    with pytest.raises(ValueError, match="ambiguous"):
        range_join(l.withColumnRenamed("pid", "iid"), r, bucket_s=1.0)


def test_funnel_basic_chain(spark):
    import datetime as dt

    import pandas as pd

    from raster2dggs_spark.operators.temporal import funnel

    t0 = dt.datetime(2024, 1, 1)

    def ev(uid, typ, mins):
        return (uid, typ, t0 + dt.timedelta(minutes=mins))

    rows = [
        # u1 completes all three in order
        ev(1, "a", 0), ev(1, "b", 5), ev(1, "c", 9),
        # u2: b BEFORE a -> stops after a
        ev(2, "b", 0), ev(2, "a", 3),
        # u3: a then c (no b) -> stops at a
        ev(3, "a", 0), ev(3, "c", 2),
        # u4: equal timestamps do not chain (strictly after)
        ev(4, "a", 0), (4, "b", t0),
    ]
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["user_id", "event_type", "ts"]))
    out = {r.step: (r.event_type, r.n_entities, r.frac_of_first)
           for r in funnel(df, ["a", "b", "c"]).collect()}
    assert out[1] == ("a", 4, 1.0)
    assert out[2] == ("b", 1, 0.25)
    assert out[3] == ("c", 1, 0.25)


def test_funnel_window_anchored_at_first(spark):
    import datetime as dt

    import pandas as pd

    from raster2dggs_spark.operators.temporal import funnel

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, "a", t0), (1, "b", t0 + dt.timedelta(seconds=50)),
        (1, "c", t0 + dt.timedelta(seconds=120)),   # outside 100s of t1
        (2, "a", t0), (2, "b", t0 + dt.timedelta(seconds=30)),
        (2, "c", t0 + dt.timedelta(seconds=90)),    # inside
    ]
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["user_id", "event_type", "ts"]))
    out = {r.step: r.n_entities
           for r in funnel(df, ["a", "b", "c"], within_s=100).collect()}
    assert out == {1: 2, 2: 2, 3: 1}


def test_funnel_first_touch_earliest(spark):
    import datetime as dt

    import pandas as pd

    from raster2dggs_spark.operators.temporal import funnel

    t0 = dt.datetime(2024, 1, 1)
    # second 'a' at +10 would allow the later 'b'; first-touch at 0
    # requires b AFTER 0 -> the b at +5 chains from the FIRST a
    rows = [(1, "a", t0), (1, "a", t0 + dt.timedelta(10)),
            (1, "b", t0 + dt.timedelta(5))]
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["user_id", "event_type", "ts"]))
    out = {r.step: r.n_entities
           for r in funnel(df, ["a", "b"]).collect()}
    assert out == {1: 1, 2: 1}


def test_cohort_retention_known(spark):
    import datetime as dt

    import pandas as pd

    from raster2dggs_spark.operators.temporal import cohort_retention

    mon = dt.datetime(2024, 1, 1)  # a Monday
    rows = [
        (1, mon), (1, mon + dt.timedelta(days=8)),    # w0, w1
        (2, mon + dt.timedelta(days=2)),              # w0 only
        (3, mon + dt.timedelta(days=7)),              # cohort week 2
        (3, mon + dt.timedelta(days=22)),             # offset 2
    ]
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["user_id", "ts"]))
    out = {(str(r.cohort_week)[:10], r.week_offset):
           (r.n_active, r.cohort_size, r.retention)
           for r in cohort_retention(df).collect()}
    assert out[("2024-01-01", 0)] == (2, 2, 1.0)
    assert out[("2024-01-01", 1)] == (1, 2, 0.5)
    assert out[("2024-01-08", 0)] == (1, 1, 1.0)
    assert out[("2024-01-08", 2)] == (1, 1, 1.0)
    assert len(out) == 4
