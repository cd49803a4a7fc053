"""Iceberg-style table layer: snapshot commit, manifest row counts,
read-back, count audit."""

import os


def test_icetable_roundtrip(spark, tmp_path):
    from raster2dggs_spark.sources import IceTable
    import pyspark.sql.functions as F

    df = spark.range(1000).withColumn("part", (F.col("id") % 4).cast("string"))
    t = IceTable(str(tmp_path / "tbl"))
    snap = t.write(df, "part", lineage={"op": "unit-test", "inputs": ["range"]})
    assert snap["version"] == 1
    assert snap["total_rows"] == 1000
    assert len(snap["manifests"]) == 4
    assert all(m["row_count"] == 250 for m in snap["manifests"])
    assert snap["lineage"]["op"] == "unit-test"
    back = t.read(spark)
    assert back.count() == 1000
    assert t.verify_counts(spark)
    assert t.committed_partitions() == {f"part={i}" for i in range(4)}
    # second snapshot chains lineage
    snap2 = t.write(df.where("id < 500"), "part")
    assert snap2["version"] == 2
    assert snap2["parent_version"] == 1
    assert t.current_version() == 2
