"""Structured Streaming analogues of the batch aggregations.

The reference is a batch CLI (SURVEY.md §2.8); these operators make the
engine's aggregation surface incremental: the same logical plan runs on
``readStream`` with watermarked event-time windows, which is how the
100-TB pipeline ingests continuously arriving tiles/events.

Each transformation is defined once over a DataFrame and works for BOTH
batch and streaming inputs — tests assert streaming (availableNow) ==
batch on identical data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_stats(events: DataFrame, window: str = "1 hour",
                         watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window per-type counts and value sums with late-data
    tolerance.  Works on batch or streaming input."""
    # parquet timestamps may arrive as TIMESTAMP_NTZ; watermarks need the
    # instant type (session tz is pinned to UTC in session.py)
    e = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if e.isStreaming:
        e = e.withWatermark("ts", watermark)
    return (
        e.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


def dedup_stream(events: DataFrame, key: str = "event_id",
                 watermark: str = "2 hours") -> DataFrame:
    """Streaming exact-dedup on a key within the watermark horizon."""
    e = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if e.isStreaming:
        e = e.withWatermark("ts", watermark)
        return e.dropDuplicatesWithinWatermark([key])
    return e.dropDuplicates([key])


def stream_events_from_parquet(spark: SparkSession, path: str,
                               schema) -> DataFrame:
    """File-source stream over a parquet directory (one file per
    micro-batch by default)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def run_stream_to_memory(stream_df: DataFrame, name: str,
                         output_mode: str = "complete"):
    """availableNow trigger → in-memory sink; returns the finished query.
    (Test harness: processes everything currently available, then stops.)
    ``output_mode``: "complete" for aggregations, "append" for row
    streams (dedup)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def zonal_windowed_event_stats(events: DataFrame, zone_cells: DataFrame,
                               res: int = 4, dggs: str = "hex7",
                               window: str = "1 hour",
                               watermark: str = "2 hours",
                               lon_col: str = "lon",
                               lat_col: str = "lat",
                               max_broadcast_cover: int | None = 2_000_000
                               ) -> DataFrame:
    """Geo × time composite: per (tumbling window, zone) event counts and
    value sums.  The geometry side is the DGGS equi-join trick — events
    encode to cells (Arrow UDF), zones arrive pre-covered as a
    (cell, zone_id) table — so the streaming plan is a stateless
    static-side join followed by a watermarked windowed aggregation
    (Structured Streaming supports exactly this shape).  Works on batch
    or streaming input; zonal semantics are cell-granularity, matching
    zonal_join.

    The static zone side is broadcast only under a size gate (the
    ``_gate_broadcast`` idiom, round-4 VERDICT #1): a continental zone
    layer covered at fine res is the unbounded-cover case where a forced
    broadcast OOMs the driver.  ``zone_cells`` is batch-static, so the
    bounded ``limit(n+1).count()`` probe is legal here — one job at
    query setup, not per micro-batch — and the side is persisted first:
    the static side of a stream-static join is re-planned EVERY
    micro-batch, so caching it (memory-and-disk, spilling when huge) is
    correct independently of the gate and makes the probe's partial
    work reusable instead of a second cover computation.  Above the
    gate the equi-join shuffles (batch) / hash-joins the persisted side
    (streaming) — correct at any zone-layer size.  ``None`` forces the
    broadcast (caller asserts the cover is tiny)."""
    @F.pandas_udf("long")
    def enc(lon, lat):
        import numpy as np
        import pandas as pd

        from raster2dggs_spark.dggs import cover

        return pd.Series(cover.encode(
            lon.values.astype(np.float64), lat.values.astype(np.float64),
            res, dggs,
        ))

    e = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if e.isStreaming:
        e = e.withWatermark("ts", watermark)
    e = e.withColumn("cell", enc(F.col(lon_col), F.col(lat_col)))
    if max_broadcast_cover is None:
        z = F.broadcast(zone_cells)
    else:
        # eager localCheckpoint instead of a bare persist: zone_cells is
        # batch-static, so this materializes once, truncates lineage, and
        # is GC-cleaned with the DataFrame — no cache leak across repeated
        # query setups in a long-lived session (round-5 ADVICE)
        zc = zone_cells.localCheckpoint(eager=True)
        n = zc.limit(max_broadcast_cover + 1).count()
        z = F.broadcast(zc) if n <= max_broadcast_cover else zc
    j = e.join(z, "cell")
    return (
        j.groupBy(F.window("ts", window).alias("w"), "zone_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "zone_id", "n_events", "sum_value",
        )
    )


def interval_join_stream(left: DataFrame, right: DataFrame,
                         max_lag_s: int = 1800,
                         watermark: str = "2 hours") -> DataFrame:
    """Stream-stream interval join (the attribution shape: every RIGHT
    event pairs with the same user's LEFT events from the preceding
    ``max_lag_s`` seconds — click->purchase, impression->conversion).

    The canonical Structured Streaming two-stream join: watermarks on
    BOTH sides plus the event-time range condition let the engine
    bound its join state and evict rows older than watermark+lag —
    without the range bound the state would grow forever.  Works
    identically on batch frames (the stream==batch pytest contract);
    output (user_id, l_event_id, r_event_id, lag_s)."""
    l = left.select(
        F.col("user_id"),
        F.col("ts").cast("timestamp").alias("l_ts"),
        F.col("event_id").alias("l_event_id"))
    r = right.select(
        F.col("user_id").alias("r_user"),
        F.col("ts").cast("timestamp").alias("r_ts"),
        F.col("event_id").alias("r_event_id"))
    if l.isStreaming:
        l = l.withWatermark("l_ts", watermark)
    if r.isStreaming:
        r = r.withWatermark("r_ts", watermark)
    cond = ((F.col("user_id") == F.col("r_user"))
            & (F.col("l_ts") <= F.col("r_ts"))
            & (F.col("l_ts")
               >= F.col("r_ts") - F.expr(f"INTERVAL {int(max_lag_s)} "
                                         "SECONDS")))
    return (l.join(r, cond)
            .select("user_id", "l_event_id", "r_event_id",
                    (F.col("r_ts").cast("double")
                     - F.col("l_ts").cast("double")).alias("lag_s")))
