"""End-to-end corpus curation — the composition a training-data
pipeline actually runs, as ONE declarative plan:

    quality gate → exact-dedup canonical filter → deterministic split

Each stage is an already-oracled operator (text.quality_score,
dedup.exact_dedup, text.hash_split); composing them declaratively lets
Catalyst collapse the per-row stages into the same scan — only the
dedup's single hash shuffle and the final joins' exchanges remain.

Defined semantics (mirrored by the SQL twin): the dedup runs over the
quality SURVIVORS (canonical = min id among surviving duplicates — a
low-quality copy never becomes the canonical), and the split is
assigned to canonical docs only (duplicates never leak a near-copy of
a train doc into test — the split-contamination rule dedup exists to
enforce)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curate_documents(df: DataFrame, id_col: str, text_col: str,
                     min_quality: float = 0.5,
                     weights: dict[str, float] | None = None,
                     buckets: int = 10_000) -> DataFrame:
    """Returns one row per KEPT document:
    (id, quality, group_size, bucket, split) — quality ≥ the gate,
    canonical under exact dedup, deterministically split."""
    from raster2dggs_spark.operators.dedup import exact_dedup
    from raster2dggs_spark.operators.text import hash_split, quality_score

    q = quality_score(df, id_col, text_col).select(id_col, "quality")
    q = q.where(F.col("quality") >= min_quality)
    survivors = df.select(id_col, text_col).join(q, id_col)
    d = exact_dedup(survivors, id_col, text_col)
    canon = d.where(F.col(id_col) == F.col("canonical_id")).select(
        id_col, "group_size"
    )
    sp = hash_split(canon.select(id_col), id_col, weights, buckets)
    return (
        canon.join(q, id_col).join(sp, id_col)
        .select(id_col, "quality",
                F.col("group_size").cast("long").alias("group_size"),
                F.col("bucket").cast("long").alias("bucket"), "split")
    )
