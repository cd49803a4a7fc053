"""OD matrix + dwell time (operators/mobility.py) vs pandas replay."""

import numpy as np
import pandas as pd

from raster2dggs_spark.operators.mobility import cell_dwell, od_matrix


def _pts(spark):
    # two users hopping between three well-separated cells
    rows = [
        # user 1: A -> A -> B -> C -> B
        (1, 1, "2024-01-01 00:00:00", 10.0, 10.0),
        (2, 1, "2024-01-01 00:10:00", 10.1, 10.1),
        (3, 1, "2024-01-01 00:30:00", 50.0, 10.0),
        (4, 1, "2024-01-01 01:00:00", 90.0, -20.0),
        (5, 1, "2024-01-01 01:30:00", 50.0, 10.0),
        # user 2: B -> A
        (6, 2, "2024-01-01 00:00:00", 50.0, 10.0),
        (7, 2, "2024-01-01 02:00:00", 10.0, 10.0),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                      "lon", "lat"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf)


def test_od_matrix_transitions(spark):
    from raster2dggs_spark.dggs import geohashlib

    od = (od_matrix(_pts(spark), "user_id", "ts", res=3,
                    dggs="geohash", tiebreak_col="event_id")
          .toPandas())
    A = int(geohashlib.lonlat_to_cell([10.0], [10.0], 3)[0])
    B = int(geohashlib.lonlat_to_cell([50.0], [10.0], 3)[0])
    C = int(geohashlib.lonlat_to_cell([90.0], [-20.0], 3)[0])
    got = {(r.from_cell, r.to_cell): r.n_trips for r in od.itertuples()}
    # A->A self-step dropped; B->A happens once (user 2)
    assert got == {(A, B): 1, (B, C): 1, (C, B): 1, (B, A): 1}
    od2 = (od_matrix(_pts(spark), "user_id", "ts", res=3,
                     dggs="geohash", tiebreak_col="event_id",
                     include_self=True).toPandas())
    got2 = {(r.from_cell, r.to_cell): r.n_trips
            for r in od2.itertuples()}
    assert got2[(A, A)] == 1 and sum(got2.values()) == 5


def test_cell_dwell_intervals(spark):
    from raster2dggs_spark.dggs import geohashlib

    dw = (cell_dwell(_pts(spark), "user_id", "ts", res=3,
                     dggs="geohash", tiebreak_col="event_id")
          .toPandas())
    A = int(geohashlib.lonlat_to_cell([10.0], [10.0], 3)[0])
    B = int(geohashlib.lonlat_to_cell([50.0], [10.0], 3)[0])
    got = {(r.entity, r.cell): (r.dwell_s, r.n_points)
           for r in dw.itertuples()}
    # user 1 in A: 10 min + 20 min; in B: 30 min + 0 (last point)
    assert got[(1, A)] == (1800.0, 2)
    assert got[(1, B)] == (1800.0, 2)
    # user 2 in B: 2 h; in A: open-ended -> 0
    assert got[(2, B)] == (7200.0, 1)
    assert got[(2, A)] == (0.0, 1)


def test_event_transitions_known(spark):
    import datetime as dt

    import pandas as pd
    import pytest as _pytest

    from raster2dggs_spark.operators.mobility import event_transitions

    t0 = dt.datetime(2024, 1, 1)

    def ev(i, u, typ, secs):
        return (i, u, typ, t0 + dt.timedelta(seconds=secs))

    rows = [
        ev(1, 1, "a", 0), ev(2, 1, "b", 10), ev(3, 1, "a", 20),
        ev(4, 2, "a", 0), ev(5, 2, "b", 5),
        # equal timestamps: event_id tiebreak orders 6 before 7
        ev(6, 3, "x", 0), ev(7, 3, "y", 0),
    ]
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "ts"]))
    out = {(r.from_type, r.to_type): (r.n, r.prob)
           for r in event_transitions(df, tiebreak="event_id").collect()}
    assert out[("a", "b")] == (2, _pytest.approx(1.0))
    assert out[("b", "a")] == (1, _pytest.approx(1.0))
    assert out[("x", "y")] == (1, _pytest.approx(1.0))
    # user boundaries don't chain: no ("a","a") across users 1->2
    assert ("a", "a") not in out
    assert len(out) == 3
