"""spark-submit entry: flagship pixel→H3 indexing job.

    spark-submit --py-files dist/raster2dggs_spark.zip \\
        scripts/submit_flagship.py <images_parquet|GENERATE:n> <out_dir> [res]

Writes hive-partitioned parquet keyed by the parent cell through the
checkpointed IceTable layer (resumable; lineage + row counts recorded).
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    src, out_dir = sys.argv[1], sys.argv[2]
    res = int(sys.argv[3]) if len(sys.argv) > 3 else 9
    spark = SparkSession.builder.appName("r2dggs-flagship").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from raster2dggs_spark.operators.indexing import index_point_agg
    from raster2dggs_spark.sources.icetable import IceTable
    from raster2dggs_spark.plans.checkpoint import checkpointed_write

    if src.startswith("GENERATE:"):
        from raster2dggs_spark.sources import images_spark_df

        imgs = images_spark_df(spark, int(src.split(":")[1]), seed=42)
    else:
        imgs = spark.read.parquet(src)
    agg = index_point_agg(imgs, res=res, agg="mean")
    out = agg.withColumn("parent_hex", F.lower(F.hex("parent")))
    table = IceTable(out_dir)
    snap = checkpointed_write(
        out, table, "parent_hex",
        lineage={"op": "index_point_agg", "res": res, "src": src},
    )
    print(f"snapshot v{snap['version']}: {snap['total_rows']} rows, "
          f"{len(snap['manifests'])} partitions")


if __name__ == "__main__":
    main()
