"""Benchmark harness (driver contract: one JSON line on stdout).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>, ...extras}

The north metric (pixels indexed to H3 cells per second) is reported in
the extras; the bench image table is generated once (distributed,
deterministic seed) and cached under .bench_cache/ so generation cost
never pollutes query timings.
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
SIZE_RANGE = (32, 96)


def get_images(spark):
    cache = os.path.join(REPO, ".bench_cache", f"images_n{N_IMAGES}")
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        from raster2dggs_spark.sources import write_images_table

        # chunk sized so the table lands in >= 4*CPUS files — at real scale
        # the input naturally has thousands of files; locally we must not
        # accidentally serialize the scan onto one core
        chunk = max(8, N_IMAGES // (CPUS * 4))
        write_images_table(spark, cache, N_IMAGES, seed=42,
                           size_range=SIZE_RANGE, chunk=chunk)
    return spark.read.parquet(cache)


def main():
    from raster2dggs_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("bench", master=f"local[{CPUS}]",
                      shuffle_partitions=max(8, CPUS))
    spark.sparkContext.setLogLevel("ERROR")

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    timings: dict[str, float] = {}
    extras: dict = {}
    # quiet/loaded classification rides the artifact (round-6 VERDICT:
    # the committed JSON should be adjudicable as a quiet run by itself)
    extras["loadavg_start"] = list(os.getloadavg())

    imgs = get_images(spark)
    imgs = imgs.persist()
    n_imgs = imgs.count()

    # Methodology (round-3 VERDICT #1): one UNTIMED warm-up per query,
    # then min-of-REPS timed runs.  Cold single-shot timing conflated
    # JIT/codegen warm-up, Python-worker pool spin-up, and this VM's
    # 2-3x background-load drift with plan cost — the round-3 driver
    # artifact read 3.4x slower than a controlled re-run of identical
    # code.  min (not mean) of repeats is the standard
    # noise-on-a-shared-box estimator: noise only ever ADDS time.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    warmup = os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1") != "0"

    # per-query Spark task CPU (round-5 VERDICT #1: wall-clock alone can't
    # distinguish a plan regression from VM load — task CPU is load-robust)
    from raster2dggs_spark.profiling import SparkPhaseProfiler

    _prof = SparkPhaseProfiler(spark, enabled=True)
    task_cpu: dict[str, float] = {}

    def timed(name, fn):
        if warmup:
            fn()
        best, out, best_cpu = float("inf"), None, 0.0
        for _ in range(reps):
            snap0 = _prof._snapshot()
            t0 = time.perf_counter()
            out = fn()
            wall = time.perf_counter() - t0
            snap1 = _prof._snapshot()
            cpu_ns = sum(
                max(c - snap0.get(sid, (0, 0, 0))[1], 0)
                for sid, (_r, c, _t) in snap1.items())
            if wall < best:
                best, best_cpu = wall, cpu_ns / 1e9
        timings[name] = round(best, 3)
        task_cpu[name] = round(best_cpu, 3)
        return out

    # -- q1: flagship pixel->H3 index + per-cell mean (north metric) -----
    from raster2dggs_spark.operators.indexing import index_point_agg

    def q_pixels():
        out = index_point_agg(imgs, res=9, agg="mean")
        # force full computation incl. shuffle; agg avoids driver collect
        return out.agg(
            F.count(F.lit(1)).alias("cells"), F.sum("npx").alias("pixels")
        ).collect()[0]

    row = timed("pixel_index_hex7", q_pixels)
    extras["bench_images"] = n_imgs
    extras["cells_hex7"] = int(row["cells"])
    extras["pixels_indexed"] = int(row["pixels"])
    extras["pixels_per_sec"] = round(row["pixels"] / timings["pixel_index_hex7"], 1)

    # -- q1b: GeoTIFF ingest throughput (round 6: the real-raster source) --
    # 96 zstd-tiled predictor-2 float32 GeoTIFFs of 1024x1024 px (~100M px
    # total), generated once into the cache; the timed query is the full
    # distributed window decode -> pixel->cell explode at res 9
    def _tiff_corpus():
        import glob

        tdir = os.path.join(REPO, ".bench_cache", "tiffs_96")
        done = os.path.join(tdir, "_SUCCESS")
        if not os.path.exists(done):
            from raster2dggs_spark.sources.geotiff import write_geotiff
            import numpy as np

            os.makedirs(tdir, exist_ok=True)

            def gen(idxs):
                for i in idxs:
                    rng = np.random.default_rng(1000 + i)
                    arr = rng.random((1, 1024, 1024)).astype(np.float32)
                    lon0 = -170.0 + (i % 12) * 28.0
                    lat0 = 60.0 - (i // 12) * 14.0
                    write_geotiff(
                        os.path.join(tdir, f"b{i:03d}.tiff"), arr,
                        (2e-4, 0.0, lon0, 0.0, -2e-4, lat0), "EPSG:4326")
                    yield (i,)

            spark.sparkContext.parallelize(range(96), 32).mapPartitions(
                gen).count()
            open(done, "w").close()
        return sorted(glob.glob(os.path.join(tdir, "*.tiff")))

    tiff_paths = _tiff_corpus()

    def q_geotiff():
        from raster2dggs_spark.operators.indexing import pixel_cells
        from raster2dggs_spark.sources.geotiff import read_geotiff

        g = read_geotiff(spark, tiff_paths)
        return pixel_cells(g, res=9, n_bands=1, keep_image_id=False).agg(
            F.count(F.lit(1)).alias("px")).collect()[0]

    grow = timed("geotiff_ingest", q_geotiff)
    extras["geotiff_files"] = len(tiff_paths)
    extras["geotiff_pixels"] = int(grow["px"])
    extras["geotiff_px_per_sec"] = round(
        grow["px"] / timings["geotiff_ingest"], 1)

    # -- q1c: JPEG-in-TIFF ingest (round 7: compression-7 imagery tiles;
    # the entropy scan is per-tile Python, parallel across executors) ------
    def _jpeg_corpus():
        import glob

        tdir = os.path.join(REPO, ".bench_cache", "jpegs_16")
        done = os.path.join(tdir, "_SUCCESS")
        if not os.path.exists(done):
            from raster2dggs_spark.sources.geotiff import write_geotiff
            import numpy as np

            os.makedirs(tdir, exist_ok=True)

            def gen(idxs):
                for i in idxs:
                    x = np.linspace(0, 4 * np.pi * (1 + i % 3), 1024)
                    base = (np.sin(x)[:, None] * np.cos(x)[None, :]
                            * 0.5 + 0.5) * 255
                    arr = np.stack([base, np.roll(base, 101 + i, 0),
                                    255 - base]).astype(np.float32)
                    lon0 = -170.0 + (i % 8) * 42.0
                    lat0 = 55.0 - (i // 8) * 25.0
                    write_geotiff(
                        os.path.join(tdir, f"j{i:03d}.tiff"), arr,
                        (2e-4, 0.0, lon0, 0.0, -2e-4, lat0), "EPSG:4326",
                        compression="jpeg", tile=(256, 256),
                        jpeg_subsample=True)
                    yield (i,)

            spark.sparkContext.parallelize(range(16), 16).mapPartitions(
                gen).count()
            open(done, "w").close()
        return sorted(glob.glob(os.path.join(tdir, "*.tiff")))

    jpeg_paths = _jpeg_corpus()

    def q_jpeg():
        from raster2dggs_spark.operators.indexing import pixel_cells
        from raster2dggs_spark.sources.geotiff import read_geotiff

        g = read_geotiff(spark, jpeg_paths)
        return pixel_cells(g, res=9, n_bands=3, keep_image_id=False).agg(
            F.count(F.lit(1)).alias("px")).collect()[0]

    jrow = timed("jpeg_ingest", q_jpeg)
    extras["jpeg_files"] = len(jpeg_paths)
    extras["jpeg_pixels"] = int(jrow["px"])
    extras["jpeg_px_per_sec"] = round(
        jrow["px"] / timings["jpeg_ingest"], 1)

    # -- q2: S2 variant ---------------------------------------------------
    def q_pixels_s2():
        out = index_point_agg(imgs, res=14, dggs="s2", agg="mean")
        return out.agg(F.count(F.lit(1))).collect()

    timed("pixel_index_s2", q_pixels_s2)

    # -- q2b: rHEALPix variant ---------------------------------------------
    def q_pixels_rhp():
        out = index_point_agg(imgs, res=8, dggs="rhp", agg="mean")
        return out.agg(F.count(F.lit(1))).collect()

    timed("pixel_index_rhp", q_pixels_rhp)

    # -- q2c: a5 variant (round 5: the pentagonal aperture-5/4 grid) --------
    def q_pixels_a5():
        out = index_point_agg(imgs, res=12, dggs="a5", agg="mean")
        return out.agg(F.count(F.lit(1))).collect()

    timed("pixel_index_a5", q_pixels_a5)

    # -- q3: PIP join on driver tables -------------------------------------
    import __spark_entry__ as entrymod

    timed("pip_join", lambda: entrymod.q_pip_join(spark, SF_DIR).count())
    extras["pip_rows"] = entrymod.q_pip_join(spark, SF_DIR).count()

    # -- q4: kNN join -------------------------------------------------------
    timed("knn_join", lambda: entrymod.q_knn_join(spark, SF_DIR).count())

    # -- q5: zonal ----------------------------------------------------------
    timed("zonal_join", lambda: entrymod.q_zonal_join(spark, SF_DIR).count())

    # -- q6: relational agg core (lineitem) ----------------------------------
    timed("agg_core", lambda: entrymod.q_agg_mean_sum_count(spark, SF_DIR).count())
    timed("hist_binned", lambda: entrymod.q_hist_binned(spark, SF_DIR).count())
    timed("topk_window", lambda: entrymod.q_topk_window(spark, SF_DIR).count())

    # -- q7: training-data pipeline ops ---------------------------------------
    timed("minhash_lsh", lambda: entrymod.q_minhash_lsh(spark, SF_DIR).count())
    timed("embedding_knn", lambda: entrymod.q_embedding_knn(spark, SF_DIR).count())
    timed("embedding_pq", lambda: entrymod.q_embedding_knn_pq(spark, SF_DIR).count())

    # -- q7b: skew-realistic dedup — a synthetic boilerplate cluster (every
    # doc re-issued with a shared long prefix) drives one LSH bucket to
    # corpus size; the groupBy-count + broadcast anti-join cap must absorb
    # it map-side instead of single-tasking a window count ---------------------
    from raster2dggs_spark.operators.dedup import (
        minhash_lsh_pairs, minhash_signatures,
    )

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")) \
        .select("doc_id", "text")
    # every boiler doc = the same ~40-word boilerplate + ONE unique token:
    # ~90% of them land in ONE band bucket (the over-cap hot key the
    # anti-join must defang map-side); the rest scatter into singletons
    boiler = docs.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat(
            F.lit("lorem ipsum boilerplate header quick brown fox jumps "
                  "over the lazy dog pack my box with five dozen liquor "
                  "jugs sphinx of black quartz judge my vow zz"),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    skewed = docs.unionByName(boiler).persist()
    n_skew_docs = skewed.count()
    timed("minhash_lsh_skew",
          lambda: minhash_lsh_pairs(skewed, "doc_id", "text").count())
    # pre-cap bucket-size histogram (the skew the cap defuses)
    sig = minhash_signatures(skewed, "doc_id", "text", 16, 1)
    bexp = [F.md5(F.concat_ws("#", *[F.col(f"mh_{b * 4 + r}")
                                     for r in range(4)])).alias(f"b{b}")
            for b in range(4)]
    bs = (sig.select(F.explode(F.array(*bexp)).alias("bkey"))
          .groupBy("bkey").count())
    stats = bs.agg(F.max("count").alias("mx"),
                   F.sum(F.when(F.col("count") > 1000, 1).otherwise(0))
                   .alias("over")).collect()[0]
    extras["skew_docs"] = n_skew_docs
    extras["skew_max_bucket_precap"] = int(stats["mx"])
    extras["skew_buckets_over_cap"] = int(stats["over"])
    skewed.unpersist()

    # -- q8: overlay (supersampled coverage) on a tile subset -----------------
    from raster2dggs_spark.operators.overlay import overlay_agg

    # deterministic ~256-tile subset WITHOUT limit(): GlobalLimit collapses
    # the scan to one partition and single-tasks the whole decode+encode
    # (measured 6.5s serial compute floor); a modulo filter spreads the
    # picks across every input file so the scan stays partition-parallel.
    # Stride 17 is COPRIME to the generator's 8-scenario rotation — a
    # power-of-two stride would alias onto one scenario and silently
    # swap the workload for uniform tiles
    sub = imgs.where(F.substring("image_id", -8, 8).cast("int") % 17 == 0)
    timed("overlay_mass", lambda: overlay_agg(sub, res=7, op="mass_sum")
          .agg(F.sum("band_1")).collect())

    # -- q9: skewed parent rollup, salted (north-rule skew evidence) ----------
    from raster2dggs_spark.sources import images_spark_df
    from raster2dggs_spark.operators.indexing import index_point_agg
    from raster2dggs_spark.plans.skew import salted_agg

    skew_imgs = images_spark_df(spark, 256, seed=77,
                                scenarios=("skew_coastline",)).persist()
    skew_idx = index_point_agg(skew_imgs, res=11, agg="mean").persist()
    skew_idx.count()
    timed("skew_rollup_salted", lambda: salted_agg(
        skew_idx, ["parent"],
        {"n": ("count", "cell"), "px": ("sum", "npx")},
        salt_parts=CPUS, salt_from="cell",
    ).collect())
    timed("skew_rollup_plain", lambda: skew_idx.groupBy("parent").agg(
        F.count(F.lit(1)).alias("n"), F.sum("npx").alias("px")).collect())
    extras["skew_parents"] = skew_idx.select("parent").distinct().count()

    # -- q10: sample transfer at bench scale (round-3 VERDICT #6) -------------
    # cover + stencil is the second-most-complex UDF family.  The cell
    # transfer runs on the sub-degree tiles only: a res-8 cell transfer
    # on the 30°-tall 2-pixel geodesic2px tiles is a degenerate workload
    # (4M cells per 2 source pixels — valid semantics, but a user pairs
    # res to pixel pitch; before round-4's split-not-skip fix these
    # tiles were silently DROPPED, which is why this entry used to look
    # cheaper).  The join-path entry below keeps the full mixed table.
    from raster2dggs_spark.operators.sample import sample_cells, sample_points

    samp_tiles = imgs.where(F.abs(F.col("affine_e")) * F.col("h") < 1.0)
    extras["sample_tiles"] = samp_tiles.count()
    timed("sample_bilinear", lambda: sample_cells(samp_tiles, res=8,
                                                  kernel="bilinear")
          .agg(F.count(F.lit(1)).alias("n")).collect())

    # points derived from each tile's own affine metadata (native exprs,
    # no UDF): 16 deterministic interior points per tile, mercator tiles
    # inverted to lon/lat — guarantees the join path routes real work to
    # every tile instead of sampling empty ocean
    R = 6378137.0
    fx = (F.pmod(F.xxhash64("image_id", "i"), F.lit(1000)) / 1000.0) * 0.9 + 0.05
    fy = (F.pmod(F.xxhash64("i", "image_id"), F.lit(1000)) / 1000.0) * 0.9 + 0.05
    x = F.col("affine_c") + F.col("affine_a") * (F.col("w") * fx)
    y = F.col("affine_f") + F.col("affine_e") * (F.col("h") * fy)
    merc = F.col("crs") == "EPSG:3857"
    pts = (
        imgs.select("image_id", "w", "h", "affine_a", "affine_c",
                    "affine_e", "affine_f", "crs")
        .select("*", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("i"))
        .select(
            F.xxhash64("image_id", "i").alias("point_id"),
            F.when(merc, F.degrees(x / R)).otherwise(x).alias("lon"),
            F.when(merc, F.degrees(2.0 * F.atan(F.exp(y / R)) - 3.141592653589793 / 2.0)
                   ).otherwise(y).alias("lat"),
        )
    ).persist()
    extras["sample_points"] = pts.count()
    sp = sample_points(imgs, pts, kernel="bilinear", strategy="join")
    # plan note (VERDICT #6): the cogroup kernel path must be what runs
    # at 4096 tiles — not the collect/broadcast fast path
    splan = sp._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    extras["sample_points_cogroup_plan"] = "FlatMapCoGroupsInPandas" in splan
    timed("sample_points_join",
          lambda: sp.agg(F.count(F.lit(1)).alias("n")).collect())
    pts.unpersist()

    # -- q11: fuzzy-dedup transitive closure at scale (round-3 VERDICT #7):
    # a diameter-1000 chain + ~10^5 random edges; pointer jumping must
    # converge in O(log diameter) rounds (~12), not O(diameter) ---------------
    from raster2dggs_spark.operators.dedup import connected_components

    chain = spark.range(1000).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    rand = spark.range(99_000).select(
        (F.lit(10_000) + F.pmod(F.xxhash64(F.col("id")), F.lit(40_000)))
        .alias("id_a"),
        (F.lit(10_000) + F.pmod(F.xxhash64(F.col("id") + F.lit(1 << 20)),
                                F.lit(40_000))).alias("id_b"))
    cc_edges = chain.unionByName(rand).where("id_a != id_b").persist()
    extras["cc_edges"] = cc_edges.count()
    cc_stats: dict = {}
    timed("dedup_components_100k", lambda: connected_components(
        cc_edges, stats=cc_stats)
        .agg(F.countDistinct("component").alias("n")).collect())
    extras["cc_rounds"] = cc_stats.get("rounds")
    extras["cc_chain_diameter"] = 1000
    cc_edges.unpersist()

    # -- q12: A17 multi-parent compaction at scale — ~10^5 aperture-3
    # cells (3k seed subtrees, half uniform-valued); the distributed
    # level loop (3 bounded shuffles/level) must absorb it ----------------
    import numpy as np
    import pandas as pd
    from raster2dggs_spark.dggs import i3hlib
    from raster2dggs_spark.operators.compaction import compact_cells_3h

    rng = np.random.default_rng(42)
    slon = rng.uniform(-180, 180, 3000)
    slat = np.degrees(np.arcsin(rng.uniform(-1, 1, 3000)))
    seeds = np.unique(i3hlib.lonlat_to_cell(slon, slat, 6))
    l7 = i3hlib.cell_to_children(seeds)                    # (n, 7)
    l8 = i3hlib.cell_to_children(l7.reshape(-1)).reshape(-1)
    owner = np.repeat(np.arange(seeds.shape[0]), 49)
    vals = np.where(owner % 2 == 0, 1.0, 10.0 + owner.astype(np.float64))
    order = np.argsort(l8, kind="stable")
    c_sorted, v_sorted = l8[order], vals[order]
    first = np.concatenate([[True], c_sorted[1:] != c_sorted[:-1]])
    # duplicates (shared vertex children / adjacent seeds): keep the
    # FIRST (lowest owner) value — deterministic
    cdf = spark.createDataFrame(
        pd.DataFrame({"cell": c_sorted[first], "v": v_sorted[first]}),
        "cell long, v double",
    ).repartition(CPUS).persist()
    extras["compact3h_input"] = cdf.count()
    c3_out = {}

    def run_c3():
        out = compact_cells_3h(cdf, ["v"], res=8, min_res=6)
        c3_out["rows"] = out.count()
        return None

    timed("compact_3h_100k", run_c3)
    extras["compact3h_output"] = c3_out["rows"]
    cdf.unpersist()

    # -- q13: hydrology decode path — D8 + tile-local flow accumulation
    # over the full bench corpus (round 7): decode, per-tile descending-z
    # propagation, encode, per-image reduce; narrow, no shuffle ----------
    from raster2dggs_spark.operators.terrain import accumulation_cells

    fa_row = timed("flow_accum", lambda: accumulation_cells(imgs, res=9)
                   .agg(F.count(F.lit(1)).alias("n"),
                        F.max("acc").alias("amax")).collect()[0])
    extras["flow_accum_px"] = int(fa_row["n"])

    # -- q14: vector supercover at scale — 100k zigzag polylines exactly
    # supercovered onto quadkey res 12 (round 7, line_cells): analytic
    # crossings, one narrow mapInPandas, per-line in-task dedupe --------
    from raster2dggs_spark.operators.joins import line_cells

    lin = spark.range(100_000).select(
        F.col("id").alias("line_id"),
        (F.lit(3) + F.col("id") % 5).cast("int").alias("m"),
        (F.lit(-175.0) + (F.col("id") * 13 % 350).cast("double")).alias("a"),
        (F.lit(-55.0) + (F.col("id") * 17 % 110).cast("double")).alias("b"))
    _ks = F.sequence(F.lit(0), F.col("m"))
    lines_df = lin.select(
        "line_id",
        F.transform(_ks, lambda k: F.col("a")
                    + F.lit(0.25) * k.cast("double")).alias("xs"),
        F.transform(_ks, lambda k: F.col("b")
                    + F.lit(0.125) * (k % 2).cast("double")
                    + F.lit(0.0625) * k.cast("double")).alias("ys"),
    ).repartition(CPUS).persist()
    lines_df.count()
    lc_row = timed("line_cells_100k", lambda: line_cells(
        lines_df, 12, "quadkey")
        .agg(F.count(F.lit(1)).alias("n")).collect()[0])
    extras["line_cells_rows"] = int(lc_row["n"])
    lines_df.unpersist()

    # -- q15: vector polygon fill at scale — 100k concave L-rings exactly
    # scanline-filled onto quadkey res 11 (polygon_fill_cells): analytic
    # row-center crossings, span pairing, one narrow mapInPandas --------
    from raster2dggs_spark.operators.joins import polygon_fill_cells

    pol = spark.range(100_000).select(
        F.col("id").alias("poly_id"),
        (F.lit(-172.0) + (F.col("id") * 19 % 344).cast("double")).alias("a"),
        (F.lit(-60.0) + (F.col("id") * 23 % 120).cast("double")).alias("b"))
    _dx = [0.0, 1.5, 1.5, 0.6, 0.6, 0.0]
    _dy = [0.0, 0.0, 0.5, 0.5, 1.2, 1.2]
    polys_df = pol.select(
        "poly_id",
        F.array(*[F.col("a") + F.lit(d) for d in _dx]).alias("xs"),
        F.array(*[F.col("b") + F.lit(d) for d in _dy]).alias("ys"),
    ).repartition(CPUS).persist()
    polys_df.count()
    pf_row = timed("polyfill_100k", lambda: polygon_fill_cells(
        polys_df, 11, "quadkey")
        .agg(F.count(F.lit(1)).alias("n")).collect()[0])
    extras["polyfill_rows"] = int(pf_row["n"])
    polys_df.unpersist()

    # -- q16: iterative lattice op at scale — multi-source cost distance
    # over a 512x512 quadkey grid (262k cells, ~100 scattered sources,
    # deterministic integer costs): block-synchronous Dijkstra, rounds
    # bounded by the block-graph diameter, quiescent blocks never re-run
    from raster2dggs_spark.operators.costdist import cost_distance

    cd_n = 512
    cd = spark.range(cd_n * cd_n).select(
        (F.col("id") % cd_n).alias("tx"),
        (F.col("id") / cd_n).cast("long").alias("ty"))
    cd = cd.select(
        "tx", "ty",
        ((F.col("tx") * 7 + F.col("ty") * 11) % 13 + 1)
        .cast("double").alias("cost"),
        ((F.col("tx") * 31 + F.col("ty") * 17) % 2621 == 0).alias("is_src"))

    @F.pandas_udf("long")
    def _qk9(tx, ty):
        from raster2dggs_spark.dggs import quadkeylib

        return pd.Series(quadkeylib.tile_to_cell(tx.values, ty.values, 9))

    cd_df = (cd.withColumn("cell", _qk9("tx", "ty"))
             .select("cell", "cost", "is_src")
             .repartition(CPUS).persist())
    cd_df.count()
    cd_stats: dict = {}

    def run_cd():
        cd_stats.clear()
        return (cost_distance(cd_df, source_col="is_src", dggs="quadkey",
                              block_bits=6, stats=cd_stats)
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("dist").alias("s")).collect()[0])

    cd_row = timed("cost_distance_262k", run_cd)
    extras["cost_distance_cells"] = int(cd_row["n"])
    extras["cost_distance_rounds"] = cd_stats.get("rounds")
    extras["cost_distance_blocks_run"] = cd_stats.get("blocks_run")

    # -- q17: exact Euclidean distance transform + allocation on the same
    # 512x512 lattice (~100 sources) via the DISTRIBUTED join strategy
    # (per-column summaries on executors, one cogroup-by-row shuffle)
    from raster2dggs_spark.operators.proximity import euclidean_distance

    ed_df = cd_df.withColumn(
        "sid", (F.xxhash64("cell") % 1000).cast("long"))

    def run_ed():
        return (euclidean_distance(ed_df, source_col="is_src",
                                   dggs="quadkey", id_col="sid",
                                   strategy="join")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("d2").alias("s")).collect()[0])

    ed_row = timed("euclid_262k", run_ed)
    extras["euclid_cells"] = int(ed_row["n"])
    cd_df.unpersist()

    # -- q18: viewshed at scale — 16 observers on 128x128 integer tiles
    # (R3 bilinear sightlines, integer cross-product blocking): 16 x
    # 2.1M sightline samples, embarrassingly parallel on the decode path
    from raster2dggs_spark.operators.terrain import viewshed_cells
    from raster2dggs_spark.sources.images import (
        IMAGE_SCHEMA, encode_image,
    )

    vs_rows = []
    vn = 128
    rr_, cc_ = np.meshgrid(np.arange(vn), np.arange(vn), indexing="ij")
    for i in range(16):
        zi = ((3 * rr_ * rr_ + 5 * cc_ * cc_ + 7 * rr_ * cc_ + i)
              % 31).astype(np.float32)[None]
        vs_rows.append({
            "image_id": f"img_vshed_{i:08d}",
            "bytes": encode_image(zi, "raw"),
            "w": vn, "h": vn, "fmt": "raw",
            "caption": f"viewshed bench tile {i}",
            "phash": 0,
            "affine_a": 30.0, "affine_b": 0.0, "affine_c": 10_000.0 * i,
            "affine_d": 0.0, "affine_e": -30.0, "affine_f": 5_000.0 * i,
            "crs": "EPSG:3857", "nodata": None, "bands": 1,
            "band_names": None,
        })
    vs_imgs = spark.createDataFrame(
        pd.DataFrame(vs_rows), IMAGE_SCHEMA).repartition(CPUS).persist()
    vs_imgs.count()

    def run_vs():
        return (viewshed_cells(vs_imgs, observer=(5, 7), obs_height=3,
                               res=9, dggs="quadkey")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum(F.col("visible").cast("long")).alias("v"))
                .collect()[0])

    vs_row = timed("viewshed_262k", run_vs)
    extras["viewshed_px"] = int(vs_row["n"])
    extras["viewshed_visible_px"] = int(vs_row["v"])
    vs_imgs.unpersist()

    # -- q19: raster reprojection at scale — one 2048x2048 tile warped
    # bilinearly onto a 1M-pixel EPSG:3857 target grid (gdalwarp shape:
    # lattice + inverse mercator + kernel, all Arrow-batched)
    import math

    from raster2dggs_spark.operators.sample import warp_grid

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
        return _R * math.log(math.tan(math.pi / 4 + math.radians(lat) / 2))

    wb = (math.radians(10.05) * _R, _my(49.25),
          math.radians(10.75) * _R, _my(49.95))

    def run_warp():
        return (warp_grid(warp_imgs, wb, 1024, 1024, "EPSG:3857",
                          n_bands=1, strategy="collect")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("band_1").alias("s")).collect()[0])

    wp_row = timed("warp_1m", run_warp)
    extras["warp_px"] = int(wp_row["n"])
    warp_imgs.unpersist()

    # -- q20: Douglas-Peucker at scale — 2,000 polylines x 500 vertices
    # (1M vertices), per-line applyInPandas with exact int64 arithmetic
    from raster2dggs_spark.operators.vector import simplify_lines

    sl = spark.range(2000 * 500).selectExpr(
        "id DIV 500 AS line_id", "id % 500 AS seq",
        "(id % 500) * 3 + ((id DIV 500) * 7 + (id % 500) * 5) % 3 AS x",
        "(((id % 500) * (id % 500) * 13 + (id DIV 500) * 31) % 200)"
        " - 100 AS y").repartition(CPUS).persist()
    sl.count()

    def run_sl():
        return (simplify_lines(sl, 5.0)
                .agg(F.count(F.lit(1)).alias("n")).collect()[0])

    sl_row = timed("simplify_1m", run_sl)
    extras["simplify_vertices_in"] = 2000 * 500
    extras["simplify_vertices_kept"] = int(sl_row["n"])
    sl.unpersist()

    # -- q21: as-of join at scale — 1M rows (500k left x 500k right,
    # 5k keys): union + ONE windowed carry-forward exchange, no join node
    from raster2dggs_spark.operators.temporal import asof_join

    ev = spark.range(1_000_000).selectExpr(
        "id % 5000 AS k",
        "timestamp_micros(CAST(1700000000000000"
        " + (id * 7919) % 86400000000 AS BIGINT)) AS ts",
        "id AS event_id",
        "CAST(id % 97 AS DOUBLE) AS price").persist()
    ev.count()
    ao_l = ev.where("id % 2 = 0").select("k", "ts", "event_id")
    ao_r = ev.where("id % 2 = 1").select(
        "k", "ts", "price", "event_id")

    def run_asof():
        out = asof_join(ao_l, ao_r, on="ts", by=["k"],
                        value_cols=["price"], tiebreak="event_id")
        return out.agg(F.count(F.lit(1)).alias("n"),
                       F.count("price").alias("m")).collect()[0]

    ao_row = timed("asof_1m", run_asof)
    extras["asof_left_rows"] = int(ao_row["n"])
    extras["asof_matched"] = int(ao_row["m"])
    ev.unpersist()

    # -- q22: PassJoin edit-distance self-join — 100k numeric strings,
    # complete d=1 blocking + exact JVM levenshtein verify
    from raster2dggs_spark.operators.text import edit_distance_join

    eds = spark.range(100_000).selectExpr(
        "id", "CAST((id * 13) % 1000000 AS STRING) AS s").persist()
    eds.count()

    def run_ed():
        return (edit_distance_join(eds, "s", "id", max_d=1)
                .agg(F.count(F.lit(1)).alias("n")).collect()[0])

    ed_row = timed("edit_dist_100k", run_ed)
    extras["edit_dist_pairs"] = int(ed_row["n"])
    eds.unpersist()

    # -- q23: marching-squares contours — 64 tiles x 256x256 (4.2M px),
    # 3 levels, one applyInPandas over the tile key
    from raster2dggs_spark.operators.vector import contour_segments

    cg = spark.range(64 * 256 * 256).selectExpr(
        "id DIV 65536 AS img",
        "(id % 65536) % 256 AS x",
        "(id % 65536) DIV 256 AS y").selectExpr(
        "img", "x", "y",
        "50.0 + 45.0 * sin(x / 16.0 + img) * cos(y / 16.0) AS z"
    ).persist()
    cg.count()

    def run_contour():
        out = contour_segments(cg, levels=[20.0, 50.0, 80.0],
                               group_cols=["img"])
        return out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.sqrt((F.col("x1") - F.col("x0"))
                         * (F.col("x1") - F.col("x0"))
                         + (F.col("y1") - F.col("y0"))
                         * (F.col("y1") - F.col("y0")))).alias("len")
        ).collect()[0]

    ct_row = timed("contour_4m", run_contour)
    extras["contour_px"] = 64 * 256 * 256
    extras["contour_segments"] = int(ct_row["n"])
    cg.unpersist()

    # -- q24: lattice morphology — 1M-cell quadkey-12 set, 3x3 dilation
    # (9M scatter rows, ONE exchange, vectorized index->id encode)
    from raster2dggs_spark.operators.focal import morphology_cells

    @F.pandas_udf("long")
    def _qk12(tx, ty):
        import pandas as _pd

        from raster2dggs_spark.dggs import quadkeylib

        return _pd.Series(quadkeylib.tile_to_cell(
            tx.values, ty.values, 12))

    mo = spark.range(1_000_000).selectExpr(
        "(id * 2654435761) % 4096 AS tx",
        "(id * 40503) % 4096 AS ty").dropDuplicates().select(
        _qk12("tx", "ty").alias("cell")).persist()
    n_mo = mo.count()

    def run_morph():
        return (morphology_cells(mo, op="dilate", k=1, dggs="quadkey")
                .agg(F.count(F.lit(1)).alias("n")).collect()[0])

    mo_row = timed("morph_dilate_1m", run_morph)
    extras["morph_cells_in"] = int(n_mo)
    extras["morph_cells_out"] = int(mo_row["n"])
    mo.unpersist()

    # -- q25: map matching at scale — 50k GPS points snapped to 50k
    # polyline segments (lattice-blocked candidates, one cell equi-join
    # + groupBy-min; no all-pairs)
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
        "CAST(-30.0 + (id * 37 % 600) / 10.0 AS DOUBLE) AS b").selectExpr(
        "line_id",
        "array(a, a + 0.3, a + 0.6, a + 0.9, a + 1.2, a + 1.5) AS xs",
        "array(b, b + 0.2, b, b + 0.2, b, b + 0.2) AS ys")

    def run_snap():
        out = snap_to_segments(sp, sl_ln, radius_m=30_000.0,
                               dggs="quadkey")
        return out.agg(F.count(F.lit(1)).alias("n"),
                       F.sum("dist_m").alias("s")).collect()[0]

    sn_row = timed("snap_50k", run_snap)
    extras["snap_points_in"] = 50_000
    extras["snap_matched"] = int(sn_row["n"])
    sp.unpersist()

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "task_cpu_s": task_cpu,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "methodology": (
            f"per-query: 1 untimed warm-up + min of {reps} timed runs "
            "(cold-start and background-load noise excluded; see "
            "round-3 VERDICT #1)" if warmup else
            f"per-query: min of {reps} timed runs, NO warm-up"),
        **extras,
    }))


if __name__ == "__main__":
    main()
