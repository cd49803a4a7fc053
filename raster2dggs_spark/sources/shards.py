"""WebDataset-style tar shard sink/source for multimodal samples.

Large-scale image+caption training jobs consume **sharded tar
archives** (the WebDataset convention: one tar per shard, each sample
a group of files sharing a basename — ``<key>.img`` payload bytes,
``<key>.txt`` caption, ``<key>.json`` metadata) because sequential tar
reads keep GPUs fed where per-file object storage cannot.  This module
writes the engine's image tables into that layout and reads it back:

- :func:`write_sample_shards` — deterministic shard assignment
  ``md5(key) mod n_shards`` (stateless, reproducible, independent of
  partitioning — the hash_split contract), then ONE ``groupBy(shard)
  applyInPandas`` writes each tar (samples sorted by key within a
  shard, so output bytes are deterministic end-to-end).  Shard counts
  follow from the target samples/shard; tar I/O is stdlib ``tarfile``
  with zeroed timestamps (byte-reproducible archives).
- :func:`read_sample_shards` — shard paths fan out to executors
  (``binaryFile``-style path list, one task per shard), each unpacks
  its tar back to (key, data, caption, meta) rows.

Round-trip identity is the pytest contract.  At 100 TB the shard is
the parallelism unit in BOTH directions, exactly like production
WebDataset pipelines; a hot shard is impossible by construction
(md5 balancing).
"""

from __future__ import annotations

import io
import json
import os
import tarfile
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def write_sample_shards(df: DataFrame, path: str,
                        samples_per_shard: int = 10_000,
                        key_col: str = "image_id",
                        data_col: str = "bytes",
                        caption_col: str = "caption") -> list:
    """Write (key, payload, caption [+ remaining columns as JSON
    metadata]) into ``<path>/shard-<n>.tar``.  Returns the manifest
    ``[(shard_path, n_samples), ...]`` (also written as
    ``<path>/manifest.json``)."""
    os.makedirs(path, exist_ok=True)
    n = df.count()
    n_shards = max(1, -(-n // samples_per_shard))
    meta_cols = [c for c in df.columns
                 if c not in (key_col, data_col, caption_col)]
    shard = F.pmod(
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15),
               16, 10).cast("long"), F.lit(n_shards))
    out_schema = T.StructType([
        T.StructField("shard_path", T.StringType(), False),
        T.StructField("n_samples", T.LongType(), False)])

    def _jsonable(v):
        if v is None or (isinstance(v, float) and v != v):
            return None
        if hasattr(v, "tolist"):                 # numpy scalars/arrays
            return v.tolist()
        return v

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        sid = int(pdf["__shard"].iloc[0])
        pdf = pdf.sort_values(key_col)
        fn = os.path.join(path, f"shard-{sid:06d}.tar")
        tmp = fn + ".tmp"
        with tarfile.open(tmp, "w") as tar:
            for row in pdf.itertuples(index=False):
                rd = row._asdict()
                key = str(rd[key_col])
                members = [
                    (f"{key}.img", bytes(rd[data_col])),
                    (f"{key}.txt", str(rd[caption_col]).encode()),
                    (f"{key}.json", json.dumps(
                        {c: _jsonable(rd[c]) for c in meta_cols},
                        sort_keys=True, default=str).encode()),
                ]
                for name, blob in members:
                    ti = tarfile.TarInfo(name)
                    ti.size = len(blob)
                    ti.mtime = 0          # byte-reproducible archives
                    tar.addfile(ti, io.BytesIO(blob))
        os.replace(tmp, fn)
        return pd.DataFrame({"shard_path": [fn],
                             "n_samples": [len(pdf)]})

    manifest = (df.withColumn("__shard", shard)
                .groupBy("__shard").applyInPandas(pack, out_schema)
                .collect())
    entries = sorted((r["shard_path"], r["n_samples"]) for r in manifest)
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump([{"path": p, "n": c} for p, c in entries], f, indent=1)
    return entries


def read_sample_shards(spark: SparkSession, path: str) -> DataFrame:
    """Unpack shards back to (key, data, caption, meta_json) — one
    task per shard (the WebDataset reader shape)."""
    with open(os.path.join(path, "manifest.json")) as f:
        shard_paths = [e["path"] for e in json.load(f)]
    paths = spark.createDataFrame([(p,) for p in shard_paths],
                                  ["shard_path"]).repartition(
        max(len(shard_paths), 1), "shard_path")
    schema = T.StructType([
        T.StructField("key", T.StringType(), False),
        T.StructField("data", T.BinaryType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("meta_json", T.StringType(), False)])

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for p in b["shard_path"]:
                rows: dict[str, dict] = {}
                with tarfile.open(p, "r") as tar:
                    for m in tar.getmembers():
                        key, ext = m.name.rsplit(".", 1)
                        blob = tar.extractfile(m).read()
                        rows.setdefault(key, {})[ext] = blob
                if rows:
                    yield pd.DataFrame({
                        "key": list(rows),
                        "data": [v["img"] for v in rows.values()],
                        "caption": [v["txt"].decode()
                                    for v in rows.values()],
                        "meta_json": [v["json"].decode()
                                      for v in rows.values()]})

    return paths.mapInPandas(unpack, schema)
