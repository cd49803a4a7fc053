"""Skew-aware aggregation — the north rule's "salted repartitioning on
cell prefixes to defeat coastline/urban skew".

AQE's skew handling splits skewed *join* partitions but not groupBy
fan-in (SURVEY.md §4), so hot cells in a two-phase aggregation need
explicit salting: stage 1 aggregates on (key, salt) — spreading one hot
key over ``salt_parts`` reducers — stage 2 merges the partials.  The plan
stays 2 exchanges; for algebraic aggregates the result is bit-identical
to the unsalted plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (partial_expr, final_expr) pairs per algebraic aggregate
_ALGEBRAIC = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    specs: dict[str, tuple[str, str]],
    salt_parts: int = 16,
    salt_from: str | None = None,
) -> DataFrame:
    """Two-level salted aggregation.

    ``specs``: output_col -> (func, input_col) with func in
    count/sum/min/max/mean (mean decomposes into sum+count).
    ``salt_from``: column whose hash spreads rows (deterministic);
    defaults to a per-row deterministic spread over all non-key columns.
    """
    spread_col = salt_from or df.columns[-1]
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(spread_col)), F.lit(salt_parts))
    )
    partials = []
    finals = []
    out_exprs = []
    for out, (func, col) in specs.items():
        if func == "mean":
            partials += [F.sum(col).alias(f"__{out}_s"), F.count(col).alias(f"__{out}_c")]
            finals += [F.sum(f"__{out}_s").alias(f"__{out}_s"),
                       F.sum(f"__{out}_c").alias(f"__{out}_c")]
            out_exprs.append((F.col(f"__{out}_s") / F.col(f"__{out}_c")).alias(out))
        else:
            p, f_ = _ALGEBRAIC[func]
            partials.append(p(col).alias(f"__{out}"))
            finals.append(f_(f"__{out}").alias(f"__{out}"))
            out_exprs.append(F.col(f"__{out}").alias(out))
    stage1 = salted.groupBy(*keys, "__salt").agg(*partials)
    stage2 = stage1.groupBy(*keys).agg(*finals)
    return stage2.select(*keys, *out_exprs)
