"""Sessionization — gap-based event sessions, batch and stateful-streaming.

- ``sessionize_batch``: lag + cumulative-sum over a per-user window; pure
  native expressions, exactly reproducible in ANSI SQL (oracle-checked).
- ``sessionize_stream``: the same semantics as a custom stateful operator
  via ``applyInPandasWithState`` (per-user GroupState carries the open
  session's start/last-ts/count across micro-batches) — the Structured
  Streaming idiom for operators the built-in window aggregations can't
  express.  Equivalence with the batch plan is pytest-gated on
  event-time-ordered input.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType(), False),
    T.StructField("session_idx", T.LongType(), False),
    T.StructField("n_events", T.LongType(), False),
    T.StructField("start_ts", T.TimestampType(), False),
    T.StructField("end_ts", T.TimestampType(), False),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("session_idx", T.LongType(), False),
    T.StructField("n_events", T.LongType(), False),
    T.StructField("start_us", T.LongType(), False),
    T.StructField("last_us", T.LongType(), False),
])


def sessionize_batch(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """(user_id, session_idx, n_events, start_ts, end_ts) per session —
    a new session starts when the gap to the previous event exceeds
    ``gap_seconds``.  session_idx is 0-based per user in time order."""
    e = events.select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    # microsecond gap arithmetic — identical to the streaming twin's
    # (pd.Timestamp.value // 1000), so sub-second events sessionize the
    # same way on both paths
    gap = (
        F.unix_micros("ts")
        - F.unix_micros(F.lag("ts").over(w))
    )
    marked = e.withColumn(
        "__new",
        F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0),
    )
    sess = marked.withColumn(
        "session_idx", F.sum("__new").over(w).cast("long") - 1
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
    )


def sessionize_stream(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Stateful-streaming sessionization.  A session row is emitted when
    a gap > ``gap_seconds`` *closes* it (standard streaming semantics:
    the still-open session per user lives in GroupState and closes on the
    next qualifying event).  Requires event-time-ordered arrival per user
    (log streams / sorted replays)."""

    def fn(key, pdfs, state: GroupState):
        user_id = key[0]
        out = []
        if state.exists:
            idx, n, start_us, last_us = state.get
        else:
            idx, n, start_us, last_us = -1, 0, 0, 0
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for ts in pdf["ts"]:
                us = int(pd.Timestamp(ts).value // 1000)
                if n == 0 or (us - last_us) > gap_seconds * 1_000_000:
                    if n > 0:
                        out.append((user_id, idx, n,
                                    pd.Timestamp(start_us, unit="us"),
                                    pd.Timestamp(last_us, unit="us")))
                    idx += 1
                    n = 0
                    start_us = us
                n += 1
                last_us = us
        state.update((idx, n, start_us, last_us))
        if out:
            yield pd.DataFrame(
                out, columns=[f.name for f in SESSION_SCHEMA.fields]
            )

    e = events.select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    return e.groupBy("user_id").applyInPandasWithState(
        fn, SESSION_SCHEMA, _STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout,
    )
