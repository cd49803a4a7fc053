"""Streaming EO mosaic maintenance: scenes arrive → per-cell winner
partials → idempotent IceTable snapshots; finish == batch composite.

``best_quality`` / ``latest`` composites are ASSOCIATIVE argmax
reductions under their total comparator (rounded quality, timestamp,
scene id — operators/composite.py), so the streaming form stores each
micro-batch's per-cell WINNER and the final mosaic is the argmax of
winners — bit-identical to the batch composite over the union of
scenes, at any micro-batch boundary.  (``median`` is order-statistic,
not algebraic — stream it as the full per-(scene, cell) table and
reduce at read time instead.)

Same two exactly-once layers as streaming/ingest.py: Structured
Streaming's file-source checkpoint + the IceTable lineage batch-id
skip for re-delivered foreachBatch calls.  At 10^12-scene scale the
snapshot holds ~cells rows per batch (winners, never pixels) and the
finish is ONE groupBy(cell) over winners — the state the mosaic
actually needs, with no streaming state store to size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raster2dggs_spark.sources.icetable import IceTable
from raster2dggs_spark.sources.images import IMAGE_SCHEMA
from raster2dggs_spark.streaming.ingest import last_committed_batch

_OPERATOR = "composite_stream"


def batch_composite_winners(
    images_batch: DataFrame,
    scene_meta: DataFrame,
    res: int,
    strategy: str = "best_quality",
    dggs: str = "hex7",
    n_bands: int = 4,
    quality_band: str | None = None,
) -> DataFrame:
    """One micro-batch's mergeable frame: the per-cell winning
    observation (scene, scene_ts, quality, bands, n_scenes) — the
    batch composite of just this batch's scenes."""
    if strategy not in ("best_quality", "latest"):
        raise ValueError(
            "streaming composite needs an associative argmax strategy "
            f"(best_quality | latest), got {strategy!r}")
    from raster2dggs_spark.operators.composite import composite_scenes

    return composite_scenes(
        images_batch, scene_meta, res=res, strategy=strategy, dggs=dggs,
        n_bands=n_bands, quality_band=quality_band)


def finish_composite(
    winners: DataFrame,
    value_cols: list[str],
    strategy: str = "best_quality",
) -> DataFrame:
    """Merge any number of snapshots' winner frames into the final
    mosaic — the same max_by comparator re-applied across batches
    (argmax is associative under a total order), with ``n_scenes``
    summed so provenance counts scenes, not batches."""
    if strategy == "best_quality":
        order = F.struct(
            F.round(F.col("quality"), 4).alias("q"),
            F.col("scene_ts").alias("t"),
            F.col("scene").alias("s"),
        )
    elif strategy == "latest":
        order = F.struct(F.col("scene_ts").alias("t"),
                         F.col("scene").alias("s"))
    else:
        raise ValueError(f"strategy best_quality | latest, got {strategy!r}")
    payload = F.struct(
        F.col("scene").alias("scene"),
        F.col("scene_ts").alias("scene_ts"),
        F.col("quality").alias("quality"),
        F.col("parent").alias("parent"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    g = winners.groupBy("cell").agg(
        F.max_by(payload, order).alias("w"),
        F.sum("n_scenes").alias("n_scenes"),
    )
    return g.select(
        "cell",
        F.col("w.parent").alias("parent"),
        F.col("w.scene").alias("scene"),
        F.col("w.scene_ts").alias("scene_ts"),
        F.col("w.quality").alias("quality"),
        *[F.col(f"w.{c}").alias(c) for c in value_cols],
        "n_scenes",
    )


def make_commit_batch(table: IceTable, scene_meta: DataFrame, res: int,
                      strategy: str, dggs: str, quality_band: str | None,
                      n_bands: int, input_path: str, checkpoint_dir: str):
    """foreachBatch sink, idempotent under re-delivery (the
    streaming/ingest.py pattern: lineage batch-id skip)."""

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if int(batch_id) <= last_committed_batch(table, checkpoint_dir,
                                                 operator=_OPERATOR):
            return
        if batch_df.isEmpty():
            return
        out = batch_composite_winners(
            batch_df, scene_meta, res=res, strategy=strategy, dggs=dggs,
            n_bands=n_bands, quality_band=quality_band)
        table.write(
            out, "parent", mode="append",
            lineage={
                "operator": _OPERATOR,
                "batch_id": int(batch_id),
                "res": res, "dggs": dggs, "strategy": strategy,
                "input_path": input_path,
                "checkpoint_dir": checkpoint_dir,
            },
        )

    return commit_batch


def composite_stream(
    spark: SparkSession,
    input_path: str,
    scene_meta: DataFrame,
    table: IceTable,
    res: int,
    checkpoint_dir: str,
    strategy: str = "best_quality",
    dggs: str = "hex7",
    n_bands: int = 4,
    quality_band: str | None = None,
    max_files_per_trigger: int = 64,
):
    """Start (or resume) the streaming mosaic maintainer; returns the
    StreamingQuery (availableNow trigger — drains, then stops; rerun
    on the same checkpoint to pick up newly-arrived scenes only)."""
    stream = (
        spark.readStream.schema(IMAGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    commit = make_commit_batch(table, scene_meta, res, strategy, dggs,
                               quality_band, n_bands, input_path,
                               checkpoint_dir)
    return (
        stream.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
