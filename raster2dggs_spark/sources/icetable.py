"""Iceberg-style manifest/snapshot layer over partitioned Parquet.

No Iceberg jars are available offline (SURVEY.md §7.0d), so we implement
the subset the north rule requires: versioned snapshots with per-partition
manifests carrying row counts and lineage, enabling

- atomic publish (write data files, then commit ``metadata/vN.json``),
- partition-level resumability (a re-run skips partitions already
  committed — the Spark analogue of the reference's idempotent
  overwrite-or-ignore stage-1 store, /root/reference/raster2dggs/
  common.py:858-876),
- audit metrics (rows per partition per snapshot).

Layout::

    <root>/data/<partition_col>=<value>/part-*.parquet
    <root>/metadata/v1.json, v2.json, ...   (vN = snapshot N)
    <root>/metadata/CURRENT                 (text: latest N)
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class IceTable:
    def __init__(self, root: str):
        self.root = root
        self.meta_dir = os.path.join(root, "metadata")
        self.data_dir = os.path.join(root, "data")

    # -- snapshot bookkeeping -------------------------------------------
    def current_version(self) -> int:
        cur = os.path.join(self.meta_dir, "CURRENT")
        if not os.path.exists(cur):
            return 0
        with open(cur) as f:
            return int(f.read().strip())

    def snapshot(self, version: int | None = None) -> dict | None:
        v = self.current_version() if version is None else version
        if v == 0:
            return None
        with open(os.path.join(self.meta_dir, f"v{v}.json")) as f:
            return json.load(f)

    def committed_partitions(self) -> set[str]:
        snap = self.snapshot()
        if not snap:
            return set()
        return {m["partition"] for m in snap["manifests"]}

    # -- write path ------------------------------------------------------
    def write(
        self,
        df: DataFrame,
        partition_by: str,
        mode: str = "overwrite",
        lineage: dict | None = None,
    ) -> dict:
        """Write ``df`` hive-partitioned on ``partition_by`` and commit a new
        snapshot whose manifest records per-partition file lists + row
        counts.  ``lineage`` is free-form provenance (inputs, operator,
        params) stored verbatim in the snapshot."""
        os.makedirs(self.meta_dir, exist_ok=True)
        (df.write.mode(mode).partitionBy(partition_by).parquet(self.data_dir))
        spark = df.sparkSession
        return self._commit(spark, partition_by, lineage)

    def _commit(self, spark: SparkSession, partition_by: str, lineage) -> dict:
        # scan data files + row counts from parquet footers (cheap metadata
        # read; no full scan)
        import pyarrow.parquet as pq

        os.makedirs(self.meta_dir, exist_ok=True)

        manifests: dict[str, dict] = {}
        for dirpath, _dirs, files in os.walk(self.data_dir):
            part = os.path.relpath(dirpath, self.data_dir)
            if part == ".":
                continue
            for fn in files:
                if not fn.endswith(".parquet"):
                    continue
                fp = os.path.join(dirpath, fn)
                nrows = pq.ParquetFile(fp).metadata.num_rows
                m = manifests.setdefault(
                    part, {"partition": part, "files": [], "row_count": 0}
                )
                m["files"].append(os.path.relpath(fp, self.root))
                m["row_count"] += nrows
        prev = self.current_version()
        version = prev + 1
        snap = {
            "snapshot_id": uuid.uuid4().hex,
            "version": version,
            "parent_version": prev or None,
            "created_ms": int(time.time() * 1000),
            "partition_by": partition_by,
            "total_rows": sum(m["row_count"] for m in manifests.values()),
            "manifests": sorted(manifests.values(), key=lambda m: m["partition"]),
            "lineage": lineage or {},
        }
        tmp = os.path.join(self.meta_dir, f".v{version}.json.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(snap, f, indent=1, sort_keys=True)
        os.replace(tmp, os.path.join(self.meta_dir, f"v{version}.json"))
        with open(os.path.join(self.meta_dir, "CURRENT.tmp"), "w") as f:
            f.write(str(version))
        os.replace(
            os.path.join(self.meta_dir, "CURRENT.tmp"),
            os.path.join(self.meta_dir, "CURRENT"),
        )
        return snap

    # -- read path ---------------------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame:
        snap = self.snapshot()
        if snap is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        return spark.read.option("basePath", self.data_dir).parquet(self.data_dir)

    def verify_counts(self, spark: SparkSession) -> bool:
        """Audit: recount rows per partition and compare to the manifest."""
        snap = self.snapshot()
        if snap is None:
            return False
        df = self.read(spark)
        col = snap["partition_by"]
        actual = {
            f"{col}={r[col]}": r["cnt"]
            for r in df.groupBy(col).count().withColumnRenamed("count", "cnt").collect()
        }
        expected = {m["partition"]: m["row_count"] for m in snap["manifests"]}
        return actual == expected
