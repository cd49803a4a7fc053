"""Continuous embedding-index ingest: readStream → IVF assignment +
PQ encoding per micro-batch → checkpointed IceTable snapshots
partitioned by the IVF bucket.

At 10¹²-row scale the embedding table is an *arriving* table (the same
argument as streaming/ingest.py for tiles): each micro-batch of
(vec_id, embedding) rows is assigned to its nearest trained centroid
(broadcast — the coarse IVF routing key) and product-quantized
(broadcast codebooks, operators/similarity.py) into m small codes; the
committed table IS the serving-side IVF-PQ index — `ivfpq`-style
queries scan only the probed centroid partitions and read codes, never
raw vectors.

Rows are append-only and per-vector (no cross-batch aggregation is
needed — unlike the tile partials, an embedding's index entry is final
on arrival), so exactly-once reduces to the same two layers as tile
ingest: the Structured Streaming checkpoint plus the idempotent
batch_id-checked IceTable commit (re-delivered batches are skipped)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from raster2dggs_spark.sources.icetable import IceTable
from raster2dggs_spark.streaming.ingest import last_committed_batch

EMB_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType(), False),
    T.StructField("embedding", T.ArrayType(T.DoubleType()), False),
])


def batch_embedding_index(emb: DataFrame, centroids: DataFrame,
                          codebooks: DataFrame, dim: int,
                          m: int = 8, k: int = 16) -> DataFrame:
    """One micro-batch's index rows: (vec_id, centroid, c_cos,
    codes array<int> in subspace order) — IVF bucket + PQ codes,
    both from broadcast joins; the raw vector is dropped here and
    never stored again."""
    from raster2dggs_spark.operators.similarity import ivf_assign, pq_encode

    assigned = ivf_assign(emb, centroids)
    codes = pq_encode(emb, dim, m, k, codebooks=codebooks)
    packed = codes.groupBy("vec_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("sub"), F.col("code")))
        ).alias("__p")
    ).select("vec_id", F.col("__p.code").alias("codes"))
    return assigned.join(packed, "vec_id").select(
        "vec_id", "centroid", F.round("c_cos", 6).alias("c_cos"), "codes"
    )


def make_commit_batch(table: IceTable, centroids: DataFrame,
                      codebooks: DataFrame, dim: int, m: int, k: int,
                      input_path: str, checkpoint_dir: str):
    """Idempotent foreachBatch sink (the streaming/ingest.py pattern):
    already-committed batch_ids are skipped on re-delivery."""

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if int(batch_id) <= last_committed_batch(
                table, checkpoint_dir, "index_embeddings_stream"):
            return
        if batch_df.isEmpty():
            return
        out = batch_embedding_index(batch_df, centroids, codebooks,
                                    dim, m, k)
        table.write(
            out, "centroid", mode="append",
            lineage={
                "operator": "index_embeddings_stream",
                "batch_id": int(batch_id),
                "dim": dim, "m": m, "k": k,
                "input_path": input_path,
                "checkpoint_dir": checkpoint_dir,
            },
        )

    return commit_batch


def index_embeddings_stream(
    spark: SparkSession,
    input_path: str,
    table: IceTable,
    centroids: DataFrame,
    dim: int,
    checkpoint_dir: str,
    m: int = 8,
    k: int = 16,
    codebooks: DataFrame | None = None,
    max_files_per_trigger: int = 64,
):
    """Start (or resume) the streaming embedding indexer; returns the
    StreamingQuery (availableNow trigger — drains what exists, then
    stops; rerun on the same checkpoint to pick up new files only)."""
    from raster2dggs_spark.operators.similarity import pq_codebooks

    cb = codebooks if codebooks is not None else pq_codebooks(
        spark, dim, m, k)
    # ACTUALLY materialize the broadcast sides once (round-4 ADVICE: a
    # lazily-derived centroids DataFrame — e.g. the output of an
    # ivf_train Lloyd loop — would otherwise be re-planned, and
    # recomputed unless already checkpointed upstream, on EVERY
    # micro-batch).  Both tables are small (k_centroids × dim rows /
    # m·k·sub_dim rows); eager localCheckpoint pins the computed blocks
    # for the lifetime of the query plan.
    centroids = centroids.localCheckpoint(eager=True)
    cb = cb.localCheckpoint(eager=True)
    stream = (
        spark.readStream.schema(EMB_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    commit_batch = make_commit_batch(table, centroids, cb, dim, m, k,
                                     input_path, checkpoint_dir)
    return (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
