"""Scaling-efficiency evidence (north rule: throughput efficiency >= 0.8
from N to 4N executors; sandbox substitution per driver instruction: the
same job at local[8] vs local[32] on identical input).

Runs the flagship pixel->H3 indexing job in fresh subprocesses (one JVM
per parallelism level), 3 repeats each, reports median throughput at both
levels + efficiency T(32)/(4*T(8)), and rewrites the "Measured" section
of BASELINE.md.

Usage: python scripts/bench_scaling.py [n_images]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from raster2dggs_spark.session import get_spark
from pyspark.sql import functions as F
from raster2dggs_spark.operators.indexing import index_point_agg

cpus = int(sys.argv[1])
spark = get_spark("scaling", master=f"local[{{cpus}}]", shuffle_partitions=max(8, cpus))
spark.sparkContext.setLogLevel("ERROR")
imgs = spark.read.parquet({cache!r}).persist()
imgs.count()
best = None
for rep in range(3):
    t0 = time.time()
    out = index_point_agg(imgs, res=9, agg="mean")
    row = out.agg(F.count(F.lit(1)).alias("cells"), F.sum("npx").alias("px")).collect()[0]
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
print(json.dumps({{"cpus": cpus, "sec": best, "pixels": int(row["px"]),
                   "cells": int(row["cells"])}}))
"""


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    cache = os.path.join(REPO, ".bench_cache", f"images_n{n_images}")
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        sys.path.insert(0, REPO)
        from raster2dggs_spark.session import get_spark
        from raster2dggs_spark.sources import write_images_table

        spark = get_spark("gen", master="local[32]")
        spark.sparkContext.setLogLevel("ERROR")
        write_images_table(spark, cache, n_images, seed=42, size_range=(32, 96),
                           chunk=max(8, n_images // 128))
        spark.stop()

    runner = RUNNER.format(repo=REPO, cache=cache)
    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, "-c", runner, str(cpus)],
            capture_output=True, text=True, cwd=REPO, timeout=1800,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
        print(line)

    px = results[8]["pixels"]
    thr8 = px / results[8]["sec"]
    thr32 = px / results[32]["sec"]
    eff = thr32 / (4.0 * thr8)
    summary = {
        "pixels": px,
        "cells": results[8]["cells"],
        "sec_local8": round(results[8]["sec"], 3),
        "sec_local32": round(results[32]["sec"], 3),
        "pixels_per_sec_local8": round(thr8, 1),
        "pixels_per_sec_local32": round(thr32, 1),
        "scaling_efficiency_8_to_32": round(eff, 3),
    }
    print(json.dumps(summary))

    section = f"""## Measured (this engine, flagship pixel→H3-cell indexing, res 9)

Same job, same input ({n_images} synthetic image tiles, {px:,} kept
pixels), two parallelism levels in fresh JVMs (sandbox substitution for
N vs 4N executors), best of 3 repeats:

| parallelism | wall (s) | pixels/s |
|---|---|---|
| local[8]  (N)  | {summary["sec_local8"]} | {summary["pixels_per_sec_local8"]:,.0f} |
| local[32] (4N) | {summary["sec_local32"]} | {summary["pixels_per_sec_local32"]:,.0f} |

**Scaling efficiency T(32)/(4·T(8)) = {summary["scaling_efficiency_8_to_32"]}**
(north-rule criterion: ≥ 0.8). Reference single-node baseline:
≈ 224k pixels/s (/root/reference/README.md:461-491).
Produced by `python scripts/bench_scaling.py {n_images}`.
"""
    base = os.path.join(REPO, "BASELINE.md")
    text = open(base).read()
    text = re.sub(r"## Measured \(this engine.*\Z", "", text, flags=re.S).rstrip() + "\n\n"
    open(base, "w").write(text + section)
    print("BASELINE.md updated")


if __name__ == "__main__":
    main()
