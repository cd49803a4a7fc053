"""WebDataset-style shard sink/source (sources/shards.py)."""

import hashlib
import json
import os

import numpy as np


def test_shard_round_trip_and_determinism(spark, tmp_path):
    from raster2dggs_spark.sources.images import generate_images_pdf
    from raster2dggs_spark.sources.shards import (
        read_sample_shards, write_sample_shards,
    )

    pdf = generate_images_pdf(24, seed=11)
    df = spark.createDataFrame(pdf)
    out = str(tmp_path / "wds")
    manifest = write_sample_shards(df, out, samples_per_shard=10)
    assert sum(n for _, n in manifest) == 24
    assert len(manifest) == 3                    # ceil(24/10)
    assert os.path.exists(os.path.join(out, "manifest.json"))

    back = read_sample_shards(spark, out).toPandas()
    assert len(back) == 24
    src = pdf.set_index(pdf.image_id.astype(str))
    for r in back.itertuples():
        assert bytes(r.data) == bytes(src.loc[r.key, "bytes"])
        assert r.caption == src.loc[r.key, "caption"]
        meta = json.loads(r.meta_json)
        assert meta["w"] == int(src.loc[r.key, "w"])

    # byte-reproducible: rewriting produces identical archives
    out2 = str(tmp_path / "wds2")
    write_sample_shards(df.repartition(7), out2, samples_per_shard=10)
    for fn in sorted(os.listdir(out)):
        if fn.endswith(".tar"):
            h1 = hashlib.md5(
                open(os.path.join(out, fn), "rb").read()).hexdigest()
            h2 = hashlib.md5(
                open(os.path.join(out2, fn), "rb").read()).hexdigest()
            assert h1 == h2, fn
