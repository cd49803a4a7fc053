"""Per-query isolation harness for optimization work (guide §1.4).

NOT part of the driver contract — ``bench.py`` stays the frozen
measurement surface.  This file replicates individual bench query
setups so a single query can be timed (warm-up + min-of-N, same
methodology) and its ``explain("formatted")`` captured without paying
for the other 35 queries.

Usage:
    python bench_extra.py <query> [more queries...] [--reps N]
        [--explain plans/r08] [--no-time]

With ``--explain DIR`` the physical plan of each query's DataFrame is
written to ``DIR/<query>_<tag>.txt`` (tag from $BENCH_EXTRA_TAG,
default "plan").
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_IMAGES = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "4096"))


def get_images(spark):
    cache = os.path.join(REPO, ".bench_cache", f"images_n{N_IMAGES}")
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        raise SystemExit("run bench.py once first to build .bench_cache")
    return spark.read.parquet(cache)


def main():
    from raster2dggs_spark.session import get_spark
    from pyspark.sql import functions as F
    import numpy as np
    import pandas as pd

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 2
    explain_dir = None
    no_time = "--no-time" in sys.argv
    for i, a in enumerate(sys.argv):
        if a == "--reps":
            reps = int(sys.argv[i + 1])
            args.remove(sys.argv[i + 1])
        if a == "--explain":
            explain_dir = sys.argv[i + 1]
            args.remove(sys.argv[i + 1])
    tag = os.environ.get("BENCH_EXTRA_TAG", "plan")

    spark = get_spark("bench_extra", master=f"local[{CPUS}]",
                      shuffle_partitions=max(8, CPUS))
    spark.sparkContext.setLogLevel("ERROR")

    from raster2dggs_spark.profiling import SparkPhaseProfiler
    _prof = SparkPhaseProfiler(spark, enabled=True)

    timings, task_cpu = {}, {}

    def timed(name, fn):
        spark.sparkContext.setJobDescription(name)
        if no_time:
            fn()
            return
        fn()  # warm-up
        best, best_cpu = float("inf"), 0.0
        for _ in range(reps):
            snap0 = _prof._snapshot()
            t0 = time.perf_counter()
            fn()
            wall = time.perf_counter() - t0
            snap1 = _prof._snapshot()
            cpu_ns = sum(
                max(c - snap0.get(sid, (0, 0, 0))[1], 0)
                for sid, (_r, c, _t) in snap1.items())
            if wall < best:
                best, best_cpu = wall, cpu_ns / 1e9
        timings[name] = round(best, 3)
        task_cpu[name] = round(best_cpu, 3)
        spark.sparkContext.setJobDescription(None)

    def dump_plan(name, df):
        if explain_dir is None:
            return
        os.makedirs(explain_dir, exist_ok=True)
        p = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        with open(os.path.join(explain_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(p)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # ---------------- query builders (mirror bench.py exactly) ----------

    def b_edit_dist_100k():
        from raster2dggs_spark.operators.text import edit_distance_join

        eds = spark.range(100_000).selectExpr(
            "id", "CAST((id * 13) % 1000000 AS STRING) AS s").persist()
        eds.count()
        df = edit_distance_join(eds, "s", "id", max_d=1)
        dump_plan("edit_dist_100k", df)
        timed("edit_dist_100k", lambda: noop(
            edit_distance_join(eds, "s", "id", max_d=1)))
        eds.unpersist()

    def _cd_df():
        from pyspark.sql import functions as F

        cd_n = 512
        cd = spark.range(cd_n * cd_n).select(
            (F.col("id") % cd_n).alias("tx"),
            (F.col("id") / cd_n).cast("long").alias("ty"))
        cd = cd.select(
            "tx", "ty",
            ((F.col("tx") * 7 + F.col("ty") * 11) % 13 + 1)
            .cast("double").alias("cost"),
            ((F.col("tx") * 31 + F.col("ty") * 17) % 2621 == 0)
            .alias("is_src"))

        @F.pandas_udf("long")
        def _qk9(tx, ty):
            from raster2dggs_spark.dggs import quadkeylib

            return pd.Series(quadkeylib.tile_to_cell(
                tx.values, ty.values, 9))

        return (cd.withColumn("cell", _qk9("tx", "ty"))
                .select("cell", "cost", "is_src")
                .repartition(CPUS).persist())

    def b_cost_distance_262k():
        from raster2dggs_spark.operators.costdist import cost_distance

        cd_df = _cd_df()
        cd_df.count()
        st: dict = {}
        timed("cost_distance_262k", lambda: (
            cost_distance(cd_df, source_col="is_src", dggs="quadkey",
                          block_bits=6, stats=st)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("dist").alias("s")).collect()))
        print("cd stats:", st)
        cd_df.unpersist()

    def b_euclid_262k():
        from raster2dggs_spark.operators.proximity import euclidean_distance

        cd_df = _cd_df()
        cd_df.count()
        ed_df = cd_df.withColumn(
            "sid", (F.xxhash64("cell") % 1000).cast("long"))
        timed("euclid_262k", lambda: (
            euclidean_distance(ed_df, source_col="is_src",
                               dggs="quadkey", id_col="sid",
                               strategy="join")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("d2").alias("s")).collect()))
        cd_df.unpersist()

    def b_dedup_components_100k():
        from raster2dggs_spark.operators.dedup import connected_components

        chain = spark.range(1000).select(
            F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
        rand = spark.range(99_000).select(
            (F.lit(10_000) + F.pmod(F.xxhash64(F.col("id")), F.lit(40_000)))
            .alias("id_a"),
            (F.lit(10_000) + F.pmod(F.xxhash64(F.col("id") + F.lit(1 << 20)),
                                    F.lit(40_000))).alias("id_b"))
        cc_edges = chain.unionByName(rand).where("id_a != id_b").persist()
        cc_edges.count()
        st: dict = {}
        timed("dedup_components_100k", lambda: connected_components(
            cc_edges, stats=st)
            .agg(F.countDistinct("component").alias("n")).collect())
        print("cc stats:", st)
        cc_edges.unpersist()

    def b_snap_50k():
        from raster2dggs_spark.operators.joins import snap_to_segments

        sp = spark.range(50_000).selectExpr(
            "id AS point_id",
            "CAST(-30.0 + (id * 7919 % 600000) / 10000.0 AS DOUBLE) AS lon",
            "CAST(-30.0 + (id * 104729 % 600000) / 10000.0 AS DOUBLE)"
            " AS lat").persist()
        sp.count()
        sl_ln = spark.range(10_000).selectExpr(
            "id AS line_id",
            "CAST(-30.0 + (id * 13 % 600) / 10.0 AS DOUBLE) AS a",
            "CAST(-30.0 + (id * 37 % 600) / 10.0 AS DOUBLE) AS b"
        ).selectExpr(
            "line_id",
            "array(a, a + 0.3, a + 0.6, a + 0.9, a + 1.2, a + 1.5) AS xs",
            "array(b, b + 0.2, b, b + 0.2, b, b + 0.2) AS ys")
        df = snap_to_segments(sp, sl_ln, radius_m=30_000.0, dggs="quadkey")
        dump_plan("snap_50k", df)
        timed("snap_50k", lambda: noop(
            snap_to_segments(sp, sl_ln, radius_m=30_000.0, dggs="quadkey")))
        sp.unpersist()

    def b_compact_3h_100k():
        from raster2dggs_spark.dggs import i3hlib
        from raster2dggs_spark.operators.compaction import compact_cells_3h

        rng = np.random.default_rng(42)
        slon = rng.uniform(-180, 180, 3000)
        slat = np.degrees(np.arcsin(rng.uniform(-1, 1, 3000)))
        seeds = np.unique(i3hlib.lonlat_to_cell(slon, slat, 6))
        l7 = i3hlib.cell_to_children(seeds)
        l8 = i3hlib.cell_to_children(l7.reshape(-1)).reshape(-1)
        owner = np.repeat(np.arange(seeds.shape[0]), 49)
        vals = np.where(owner % 2 == 0, 1.0, 10.0 + owner.astype(np.float64))
        order = np.argsort(l8, kind="stable")
        c_sorted, v_sorted = l8[order], vals[order]
        first = np.concatenate([[True], c_sorted[1:] != c_sorted[:-1]])
        cdf = spark.createDataFrame(
            pd.DataFrame({"cell": c_sorted[first], "v": v_sorted[first]}),
            "cell long, v double").repartition(CPUS).persist()
        cdf.count()
        timed("compact_3h_100k", lambda: compact_cells_3h(
            cdf, ["v"], res=8, min_res=6).count())
        cdf.unpersist()

    def b_minhash_lsh():
        import __spark_entry__ as entrymod

        df = entrymod.q_minhash_lsh(spark, SF_DIR)
        dump_plan("minhash_lsh", df)
        timed("minhash_lsh",
              lambda: entrymod.q_minhash_lsh(spark, SF_DIR).count())

    def b_minhash_lsh_skew():
        from raster2dggs_spark.operators.dedup import minhash_lsh_pairs

        docs = spark.read.parquet(
            os.path.join(SF_DIR, "documents.parquet")) \
            .select("doc_id", "text")
        boiler = docs.select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.concat(
                F.lit("lorem ipsum boilerplate header quick brown fox "
                      "jumps over the lazy dog pack my box with five "
                      "dozen liquor jugs sphinx of black quartz judge "
                      "my vow zz"),
                F.col("doc_id").cast("string")).alias("text"))
        skewed = docs.unionByName(boiler).persist()
        skewed.count()
        timed("minhash_lsh_skew",
              lambda: minhash_lsh_pairs(skewed, "doc_id", "text").count())
        skewed.unpersist()

    def b_geotiff_ingest():
        import glob

        from raster2dggs_spark.operators.indexing import pixel_cells
        from raster2dggs_spark.sources.geotiff import read_geotiff

        tiff_paths = sorted(glob.glob(
            os.path.join(REPO, ".bench_cache", "tiffs_96", "*.tiff")))
        if not tiff_paths:
            raise SystemExit("run bench.py once first")
        g = read_geotiff(spark, tiff_paths)
        df = pixel_cells(g, res=9, n_bands=1, keep_image_id=False)
        dump_plan("geotiff_ingest", df)
        timed("geotiff_ingest", lambda: pixel_cells(
            read_geotiff(spark, tiff_paths), res=9, n_bands=1,
            keep_image_id=False).agg(F.count(F.lit(1))).collect())

    def b_pixel_index_hex7():
        from raster2dggs_spark.operators.indexing import index_point_agg

        imgs = get_images(spark).persist()
        imgs.count()
        df = index_point_agg(imgs, res=9, agg="mean")
        dump_plan("pixel_index_hex7", df)
        timed("pixel_index_hex7", lambda: index_point_agg(
            imgs, res=9, agg="mean").agg(
            F.count(F.lit(1)).alias("cells"),
            F.sum("npx").alias("pixels")).collect())
        imgs.unpersist()

    def b_sample_bilinear():
        from raster2dggs_spark.operators.sample import sample_cells

        imgs = get_images(spark).persist()
        imgs.count()
        samp_tiles = imgs.where(
            F.abs(F.col("affine_e")) * F.col("h") < 1.0)
        df = sample_cells(samp_tiles, res=8, kernel="bilinear")
        dump_plan("sample_bilinear", df)
        timed("sample_bilinear", lambda: sample_cells(
            samp_tiles, res=8, kernel="bilinear").agg(
            F.count(F.lit(1))).collect())
        imgs.unpersist()

    def b_sample_points_join():
        from raster2dggs_spark.operators.sample import sample_points

        imgs = get_images(spark).persist()
        imgs.count()
        R = 6378137.0
        fx = (F.pmod(F.xxhash64("image_id", "i"), F.lit(1000))
              / 1000.0) * 0.9 + 0.05
        fy = (F.pmod(F.xxhash64("i", "image_id"), F.lit(1000))
              / 1000.0) * 0.9 + 0.05
        x = F.col("affine_c") + F.col("affine_a") * (F.col("w") * fx)
        y = F.col("affine_f") + F.col("affine_e") * (F.col("h") * fy)
        merc = F.col("crs") == "EPSG:3857"
        pts = (
            imgs.select("image_id", "w", "h", "affine_a", "affine_c",
                        "affine_e", "affine_f", "crs")
            .select("*", F.explode(F.sequence(F.lit(0), F.lit(15)))
                    .alias("i"))
            .select(
                F.xxhash64("image_id", "i").alias("point_id"),
                F.when(merc, F.degrees(x / R)).otherwise(x).alias("lon"),
                F.when(merc, F.degrees(
                    2.0 * F.atan(F.exp(y / R))
                    - 3.141592653589793 / 2.0)).otherwise(y).alias("lat"),
            )
        ).persist()
        pts.count()
        df = sample_points(imgs, pts, kernel="bilinear", strategy="join")
        dump_plan("sample_points_join", df)
        timed("sample_points_join", lambda: sample_points(
            imgs, pts, kernel="bilinear", strategy="join").agg(
            F.count(F.lit(1))).collect())
        pts.unpersist()
        imgs.unpersist()

    def b_warp_1m():
        import math

        from raster2dggs_spark.operators.sample import warp_grid
        from raster2dggs_spark.sources.images import (
            IMAGE_SCHEMA, encode_image)

        wn = 2048
        wr_, wc_ = np.meshgrid(np.arange(wn), np.arange(wn), indexing="ij")
        warr = ((wr_ * 3 + wc_ * 5) % 251).astype(np.float32)[None]
        warp_imgs = spark.createDataFrame(pd.DataFrame([{
            "image_id": "img_warp_src", "bytes": encode_image(warr, "raw"),
            "w": wn, "h": wn, "fmt": "raw", "caption": "warp bench",
            "phash": 0,
            "affine_a": 0.0004, "affine_b": 0.0, "affine_c": 10.0,
            "affine_d": 0.0, "affine_e": -0.0004, "affine_f": 50.0,
            "crs": "EPSG:4326", "nodata": None, "bands": 1,
            "band_names": None,
        }]), IMAGE_SCHEMA).persist()
        warp_imgs.count()
        _R = 6378137.0

        def _my(lat):
            return _R * math.log(math.tan(
                math.pi / 4 + math.radians(lat) / 2))

        wb = (math.radians(10.05) * _R, _my(49.25),
              math.radians(10.75) * _R, _my(49.95))
        timed("warp_1m", lambda: warp_grid(
            warp_imgs, wb, 1024, 1024, "EPSG:3857",
            n_bands=1, strategy="collect").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("band_1").alias("s")).collect())
        warp_imgs.unpersist()

    def b_simplify_1m():
        from raster2dggs_spark.operators.vector import simplify_lines

        sl = spark.range(2000 * 500).selectExpr(
            "id DIV 500 AS line_id", "id % 500 AS seq",
            "(id % 500) * 3 + ((id DIV 500) * 7 + (id % 500) * 5) % 3 AS x",
            "(((id % 500) * (id % 500) * 13 + (id DIV 500) * 31) % 200)"
            " - 100 AS y").repartition(CPUS).persist()
        sl.count()
        timed("simplify_1m", lambda: simplify_lines(sl, 5.0).agg(
            F.count(F.lit(1))).collect())
        sl.unpersist()

    def b_knn_join():
        import __spark_entry__ as entrymod

        timed("knn_join",
              lambda: entrymod.q_knn_join(spark, SF_DIR).count())

    builders = {k[2:]: v for k, v in locals().items()
                if k.startswith("b_")}
    targets = args or sorted(builders)
    for q in targets:
        if q not in builders:
            raise SystemExit(f"unknown query {q!r}; have "
                             f"{sorted(builders)}")
        builders[q]()

    print(json.dumps({"queries": timings, "task_cpu_s": task_cpu,
                      "reps": reps}))


if __name__ == "__main__":
    main()
