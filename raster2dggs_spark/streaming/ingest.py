"""Continuous tile ingest: readStream → pixel-index partials →
checkpointed IceTable snapshots.

The north-rule pipeline at 10^12 images is an *arriving* table, not a
static one: new image files land in a directory (or an object-store
prefix / Kafka topic), each micro-batch runs the SAME map-side-combine
partials stage the batch path uses, and every batch commits one IceTable
snapshot (per-partition manifests + lineage with batch id).

The stream stores ALGEBRAIC PARTIALS (per-cell count/sum per band), not
finished means: partials compose exactly across micro-batches, so
``finish_mean`` over any number of snapshots equals the batch
``index_point_agg`` over the union of the inputs — the merge is
associative by construction, no approximation at batch boundaries.

Two recovery layers compose:

- Structured Streaming's checkpoint (``checkpointLocation``) makes the
  file source exactly-once at the micro-batch level;
- the IceTable commit is snapshot-isolated (sources/icetable.py): a
  crash between a batch's parquet write and its commit leaves invisible
  orphans and the restarted batch re-runs idempotently.

foreachBatch alone is only at-least-once: a crash AFTER the IceTable
commit but BEFORE Structured Streaming records the batch in its
checkpoint re-runs the batch on restart.  ``commit_batch`` therefore
checks the table's committed lineage for this stream's ``batch_id``
before writing and skips batches already published (the standard
foreachBatch idempotent-sink pattern) — together the two layers are
exactly-once for this single-writer table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raster2dggs_spark.sources.icetable import IceTable
from raster2dggs_spark.sources.images import IMAGE_SCHEMA


def batch_cell_partials(images: DataFrame, res: int, dggs: str = "hex7",
                        parent_res: int | None = None,
                        n_bands: int = 4) -> DataFrame:
    """One micro-batch's mergeable frame: (parent, cell, npx,
    band_i_cnt, band_i_sum) — the algebraic partials of ``mean``."""
    from raster2dggs_spark.operators.indexing import (
        band_cols, cell_partials, default_parent_res,
    )
    from raster2dggs_spark.operators.joins import parent_expr

    if parent_res is None:
        parent_res = default_parent_res(res, dggs)
    p = cell_partials(images, res, parent_res, dggs, None, n_bands,
                      "omit", stats=("cnt", "sum"))
    aggs = [F.sum("npx").alias("npx")]
    for c in band_cols(n_bands):
        aggs += [F.sum(f"{c}_cnt").alias(f"{c}_cnt"),
                 F.sum(f"{c}_sum").alias(f"{c}_sum")]
    g = p.groupBy("cell").agg(*aggs)
    return g.withColumn(
        "parent", parent_expr("cell", parent_res, dggs, from_res=res)
    )


def finish_mean(partials: DataFrame, n_bands: int = 4) -> DataFrame:
    """Merge any number of snapshots' partials into final per-cell means
    — exactly index_point_agg's output over the union of all inputs."""
    from raster2dggs_spark.operators.indexing import band_cols

    aggs = [F.sum("npx").alias("npx")]
    for c in band_cols(n_bands):
        aggs += [F.sum(f"{c}_cnt").alias(f"{c}_cnt"),
                 F.sum(f"{c}_sum").alias(f"{c}_sum")]
    g = partials.groupBy("parent", "cell").agg(*aggs)
    out = [F.col("parent"), F.col("cell"), F.col("npx")]
    for c in band_cols(n_bands):
        out.append(
            F.when(F.col(f"{c}_cnt") > 0,
                   F.col(f"{c}_sum") / F.col(f"{c}_cnt")).alias(c)
        )
    return g.select(*out)


def last_committed_batch(table: IceTable, checkpoint_dir: str,
                         operator: str = "index_images_stream") -> int:
    """Highest batch_id this stream (keyed by its checkpoint dir +
    operator) has committed to ``table``, or -1.  Walks snapshots
    newest-first so interleaved non-stream commits to the same table
    don't mask it."""
    for v in range(table.current_version(), 0, -1):
        lin = (table.snapshot(v) or {}).get("lineage", {})
        if (lin.get("operator") == operator
                and lin.get("checkpoint_dir") == checkpoint_dir
                and "batch_id" in lin):
            return int(lin["batch_id"])
    return -1


def make_commit_batch(table: IceTable, res: int, dggs: str,
                      input_path: str, checkpoint_dir: str):
    """The foreachBatch sink, idempotent under re-delivery: a crash AFTER
    the IceTable commit but BEFORE the streaming checkpoint records the
    batch re-runs it on restart — already-committed batch_ids are skipped
    (batches commit in order for a single-writer stream)."""

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if int(batch_id) <= last_committed_batch(table, checkpoint_dir):
            return
        # probe the cheap INPUT side (limit-1 scan), not the aggregated
        # output — isEmpty on `out` would run the whole pipeline twice
        if batch_df.isEmpty():
            return
        out = batch_cell_partials(batch_df, res, dggs)
        table.write(
            out, "parent", mode="append",
            lineage={
                "operator": "index_images_stream",
                "batch_id": int(batch_id),
                "res": res, "dggs": dggs,
                "input_path": input_path,
                "checkpoint_dir": checkpoint_dir,
            },
        )

    return commit_batch


def index_images_stream(
    spark: SparkSession,
    input_path: str,
    table: IceTable,
    res: int,
    checkpoint_dir: str,
    dggs: str = "hex7",
    max_files_per_trigger: int = 64,
):
    """Start (or resume) the streaming indexer; returns the
    StreamingQuery (availableNow trigger: drains what exists, then
    stops — rerun on the same checkpoint to pick up new files only)."""
    stream = (
        spark.readStream.schema(IMAGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    commit_batch = make_commit_batch(table, res, dggs, input_path,
                                     checkpoint_dir)
    return (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def index_geotiffs_stream(
    spark: SparkSession,
    input_path: str,
    table: IceTable,
    res: int,
    checkpoint_dir: str,
    dggs: str = "hex7",
    max_files_per_trigger: int = 64,
):
    """Continuous RASTER-FILE ingest (round 6): GeoTIFFs landing in a
    directory / object-store prefix stream straight into cell partials.

    The streaming source is Spark's ``binaryFile`` format with only the
    ``path`` column selected — the source prunes ``content``, so the
    stream moves file *names*, not pixels.  Each micro-batch hands its
    (bounded, ≤ max_files_per_trigger) path list to ``read_geotiff``,
    which plans windows and decodes tiles on executors exactly like the
    batch path; the same algebraic-partials commit gives exactly-once
    table semantics (idempotent batch_id skip + snapshot isolation,
    see the module docstring)."""
    from pyspark.sql import types as T

    from raster2dggs_spark.sources.geotiff import read_geotiff

    binary_schema = T.StructType([
        T.StructField("path", T.StringType()),
        T.StructField("modificationTime", T.TimestampType()),
        T.StructField("length", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    stream = (
        spark.readStream.format("binaryFile")
        .schema(binary_schema)
        .option("pathGlobFilter", "*.tif*")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(input_path)
        .select("path")
    )

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if int(batch_id) <= last_committed_batch(table, checkpoint_dir):
            return
        # bounded collect: ≤ max_files_per_trigger path strings
        from urllib.parse import unquote, urlparse

        paths = []
        for r in batch_df.collect():
            u = urlparse(r.path)
            paths.append(unquote(u.path) if u.scheme == "file" else r.path)
        if not paths:
            return
        imgs = read_geotiff(spark, paths)
        out = batch_cell_partials(imgs, res, dggs)
        table.write(
            out, "parent", mode="append",
            lineage={
                "operator": "index_geotiffs_stream",
                "batch_id": int(batch_id),
                "res": res, "dggs": dggs,
                "input_path": input_path,
                "checkpoint_dir": checkpoint_dir,
                "n_files": len(paths),
            },
        )

    return (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
