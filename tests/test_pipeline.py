"""End-to-end curation composition (operators/pipeline.py)."""

import pandas as pd

from pyspark.sql import functions as F


def test_curate_documents_semantics(spark):
    from raster2dggs_spark.operators.pipeline import curate_documents

    pdf = pd.DataFrame({
        "doc_id": range(8),
        "text": [
            "the quick brown fox and the lazy dog went to a town in summer",
            "the quick brown fox and the lazy dog went to a town in summer",
            "!!! ??? ###",                               # low quality
            "a different story about the sea and the sky to sail in",
            "the quick brown fox and the lazy dog went to a town in summer",
            "words of a and the to in " * 8,
            "!!! ??? ###",                               # low-quality dup
            "unique content entirely its own thing of the day in town and",
        ],
    })
    df = spark.createDataFrame(pdf)
    out = curate_documents(df, "doc_id", "text", min_quality=0.3).toPandas()
    kept = set(out["doc_id"])
    # duplicates collapse to the min SURVIVING id
    assert 0 in kept and 1 not in kept and 4 not in kept
    # the low-quality docs are gone entirely (no canonical among them)
    assert 2 not in kept and 6 not in kept
    g = out.set_index("doc_id")["group_size"]
    assert g[0] == 3                       # three surviving copies
    assert (out["quality"] >= 0.3).all()
    assert set(out["split"]) <= {"train", "val", "test"}
    # exactly one split row per kept doc — duplicates can never straddle
    assert len(out) == len(kept)
