"""Mergeable distinct-count sketches with cross-engine determinism.

Native approximate-distinct implementations (Spark's HLL++ /
DataSketches, DuckDB's approx_count_distinct) use engine-private hash
functions, so their estimates can never be compared across engines.
These operators build the sketches from **md5** — the one hash both
Spark and DuckDB share — so the ENTIRE sketch, not just its contract,
is reproducible: the oracle gate recomputes the same registers /
minima relationally and the estimates hash-match to 4dp.

- :func:`kmv_distinct` — K-Minimum-Values (Bar-Yossef et al. 2002;
  the "bottom-k" / theta-sketch family): per group keep the k smallest
  normalized hashes; estimate = (k-1) / h_(k) when the group has >= k
  distinct values, else the exact distinct count.  Relative error
  ~ 1/sqrt(k-2).
- :func:`hll_distinct` — HyperLogLog (Flajolet et al. 2007): bucket =
  top ``p`` bits of a 60-bit md5 prefix, register = position of the
  leading 1 in the remainder; harmonic-mean estimate with the standard
  small-range linear-counting correction.  Relative error
  ~ 1.04/sqrt(2^p).

Both are one groupBy over pre-hashed rows (map-side partial
aggregation; registers/minima combine associatively) — the 100-TB
count-distinct shape where an exact distinct would shuffle every key.
The per-(group, bucket) register aggregation never materializes more
than ``groups x 2^p`` rows.  All arithmetic is Column expressions; the
only float transcendentals (log2, powers of two) evaluate on identical
double inputs in both engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 15 hex digits = 60 bits: exact in int64 AND in float64 (< 2^53 after
# the bucket split), so normalization is bit-identical across engines
_HBITS = 60


def _h60(col):
    """First 60 bits of md5(value) as a non-negative long."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15),
                  16, 10).cast("long")


def kmv_distinct(df: DataFrame, group_cols: list, value_col: str,
                 k: int = 64) -> DataFrame:
    """K-Minimum-Values distinct-count estimate per group.

    Output: group cols + ``n_hashes`` (distinct hashes seen, capped at
    ``k``) + ``est_distinct`` (double, 4dp).  Exact when the group has
    fewer than ``k`` distinct values."""
    h = (F.conv(F.substring(F.md5(F.col(value_col).cast("string")),
                            1, 15), 16, 10).cast("long")
         .cast("double") / float(1 << _HBITS))
    # two-stage bottom-k (the bm25 idiom): per-(group, 256-bucket)
    # local minima bound any one aggregation's set to ~distinct/256,
    # the merge sees <= 256k values per group — no unbounded
    # collect_set on a hot group
    st1 = (df.select(*group_cols, h.alias("hv"),
                     F.pmod(F.xxhash64(F.col(value_col).cast("string")),
                            F.lit(256)).alias("__b"))
           .groupBy(*group_cols, "__b")
           .agg(F.slice(F.sort_array(F.collect_set("hv")), 1, k)
                .alias("part")))
    mins = (st1.select(*group_cols, F.explode("part").alias("hv"))
            .groupBy(*group_cols)
            .agg(F.slice(F.sort_array(F.collect_set("hv")), 1, k)
                 .alias("mins")))
    nk = F.size("mins")
    est = F.when(nk < k, nk.cast("double")) \
           .otherwise((k - 1) / F.element_at("mins", k))
    return mins.select(*group_cols,
                       nk.cast("long").alias("n_hashes"),
                       F.round(est, 4).alias("est_distinct"))


def hll_distinct(df: DataFrame, group_cols: list, value_col: str,
                 p: int = 12) -> DataFrame:
    """HyperLogLog distinct-count estimate per group (registers from
    the shared md5, so the sketch itself is engine-reproducible).

    Output: group cols + ``est_distinct`` (double, 4dp, with the
    standard m*ln(m/V) linear-counting small-range correction)."""
    if not 4 <= p <= 18:
        raise ValueError("p in 4..18")
    m = 1 << p
    wbits = _HBITS - p
    h = _h60(F.col(value_col))
    bucket = F.shiftright(h, wbits)
    w = h - F.shiftleft(bucket, wbits)          # low wbits
    # rho = leading-zero count of w within wbits, + 1
    rho = F.when(w > 0,
                 wbits - F.floor(F.log2(w.cast("double"))).cast("long")
                 ).otherwise(F.lit(wbits + 1))
    regs = (df.select(*group_cols, bucket.alias("b"), rho.alias("r"))
            .groupBy(*group_cols, "b").agg(F.max("r").alias("mj")))
    if m == 16:
        alpha = 0.673
    elif m == 32:
        alpha = 0.697
    elif m == 64:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mj").cast("double")))
        .alias("ssum"),
        F.count(F.lit(1)).alias("nonzero"))
    raw = F.lit(alpha * m * m) / (F.col("ssum") + (m - F.col("nonzero")))
    # small-range: V = number of ZERO registers = m - nonzero
    v = (m - F.col("nonzero")).cast("double")
    est = F.when((raw <= 2.5 * m) & (v > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / v)) \
           .otherwise(raw)
    return agg.select(*group_cols, F.round(est, 4).alias("est_distinct"))


def cms_frequencies(df: DataFrame, value_col: str,
                    candidates: DataFrame, cand_col: str = "value",
                    width: int = 1024, depth: int = 4) -> DataFrame:
    """Count-Min frequency estimates (Cormode & Muthukrishnan 2005)
    for a candidate value set — the heavy-hitter / frequency-cap
    sketch, built like the others from salted md5 so the REGISTERS are
    cross-engine reproducible.

    ``depth`` independent rows of ``width`` counters: row d hashes
    ``md5("<d>:" || value) % width``; an item's estimate is the MIN of
    its ``depth`` counters — always >= the true count, within
    eN/width with probability 1 - (1/2)^depth.  One groupBy builds all
    registers (depth x width rows total, map-side combinable); the
    candidate lookup is a join against that tiny table.  Candidates
    are explicit because a CMS cannot enumerate keys — pair with
    :func:`kmv_distinct`/top-k for discovery.  Output: (value,
    est_count)."""
    def bucket(col, d):
        h = F.conv(F.substring(F.md5(
            F.concat(F.lit(f"{d}:"), col.cast("string"))), 1, 15),
            16, 10).cast("long")
        return F.pmod(h, F.lit(width))

    regs = None
    for d in range(depth):
        r = df.select(F.lit(d).alias("d"),
                      bucket(F.col(value_col), d).alias("b"))
        regs = r if regs is None else regs.unionByName(r)
    counters = regs.groupBy("d", "b").agg(
        F.count(F.lit(1)).alias("c"))
    probes = None
    for d in range(depth):
        p = candidates.select(F.col(cand_col).alias("value"),
                              F.lit(d).alias("d"),
                              bucket(F.col(cand_col), d).alias("b"))
        probes = p if probes is None else probes.unionByName(p)
    return (probes.join(counters, ["d", "b"], "left")
            .groupBy("value")
            .agg(F.min(F.coalesce(F.col("c"), F.lit(0)))
                 .cast("long").alias("est_count")))
