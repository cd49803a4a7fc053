"""Hierarchical cell compaction (SURVEY.md §2.4 A16).

Reference semantics (rasterindexer.py:474-513): bottom-up from res to
parent_res, a parent replaces its children iff ALL expected children are
present AND every value column is uniform across them; repeat per level.
Our H3 layout is uniformly 7-ary (h3lib docstring), so expected_count is
7 per level everywhere (libh3's pentagon-aware count differs — see
h3lib).

Spark expression of one level: groupBy(native-bitwise parent) with
count + per-column distinct-count; qualifying groups collapse to one
parent row.  The loop runs res−target levels; each level is one
exchange over a strictly shrinking frame.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raster2dggs_spark.operators.joins import parent_expr


def compact_cells(df: DataFrame, value_cols: list[str], res: int,
                  min_res: int = 0, dggs: str = "hex7",
                  cell_col: str = "cell") -> DataFrame:
    """Compact a single-resolution cell frame bottom-up to ``min_res``.

    Returns the mixed-resolution frame (cell ids carry their res — in
    the bit layout for hex7/s2, in the packed res nibble for
    geohash/rhp).  Exact-equality uniformity, NaN-safe via null-safe
    comparison on a canonical struct.  All five hierarchical grids
    compact: hex7 (7-ary), s2 (4-ary), geohash (32-ary prefix tree),
    rhp (9-ary), a5 (4-ary, 5-ary at the res 1→0 level — the
    aperture-5-then-4 schedule) — parent derivation stays native
    bit/int arithmetic (joins.parent_expr), zero Python in the loop."""
    if dggs not in ("hex7", "s2", "geohash", "rhp", "a5", "i4r", "i9r",
                    "e4r", "e9r", "quadkey"):
        raise ValueError(
            f"compact: no hierarchy arithmetic for {dggs!r} "
            "(maidenhead mixes 10/24-ary per level)"
        )

    def children_at(parent_res: int) -> int:
        if dggs == "a5":
            return 5 if parent_res == 0 else 4
        return {"hex7": 7, "s2": 4, "geohash": 32, "rhp": 9, "i4r": 4,
                "i9r": 9, "e4r": 4, "e9r": 9, "quadkey": 4}[dggs]
    out_parts: list[DataFrame] = []
    cur = df
    for r in range(res, min_res, -1):
        parent = parent_expr(cell_col, r - 1, dggs, from_res=r).alias("__parent")
        val_struct = F.struct(*[F.col(c) for c in value_cols])
        g = cur.select(parent, F.col(cell_col), val_struct.alias("__v"))
        stats = g.groupBy("__parent").agg(
            F.count(F.lit(1)).alias("__n"),
            F.count_distinct(F.col("__v")).alias("__d"),
            F.first("__v").alias("__fv"),
        )
        compactable = stats.where(
            (F.col("__n") == children_at(r - 1)) & (F.col("__d") == 1)
        )
        parents = compactable.select(
            F.col("__parent").alias(cell_col),
            *[F.col("__fv")[c].alias(c) for c in value_cols],
        )
        kept = (
            g.join(compactable.select("__parent"), "__parent", "left_anti")
            .select(
                F.col(cell_col), *[F.col("__v")[c].alias(c) for c in value_cols]
            )
        )
        out_parts.append(kept)
        cur = parents  # parents may compact further at the next level
    out_parts.append(cur.select(cell_col, *value_cols))
    return reduce(lambda a, b: a.unionByName(b), out_parts)


def uncompact_cells(df: DataFrame, res: int, dggs: str = "hex7",
                    cell_col: str = "cell") -> DataFrame:
    """Inverse: expand every cell to its res-``res`` descendants (values
    replicated).  Used by the round-trip invariant test; the descendant
    enumeration happens in a vectorized UDF (digit arithmetic)."""
    from pyspark.sql import types as T
    import numpy as np
    import pandas as pd
    from typing import Iterator

    other = [c for c in df.columns if c != cell_col]
    schema = T.StructType(
        [T.StructField(cell_col, T.LongType(), False)]
        + [df.schema[c] for c in other]
    )

    def _expand_hex7(group: np.ndarray, r_cur: int) -> np.ndarray:
        """(m,) cells at r_cur -> (m, 7^depth) descendants at res —
        vectorized digit enumeration (no per-row Python)."""
        depth = res - r_cur
        n = 7 ** depth
        u = group.astype(np.uint64)
        base = (u & ~(np.uint64(0xF) << np.uint64(52))) | (
            np.uint64(res) << np.uint64(52)
        )
        # clear the fill digits for levels r_cur+1..res
        clear = np.uint64(0)
        pat = np.zeros(n, dtype=np.uint64)
        digs = np.arange(n)
        for lvl in range(depth):
            shift = 3 * (15 - (r_cur + 1 + lvl))
            clear |= np.uint64(7) << np.uint64(shift)
            d = ((digs // (7 ** (depth - lvl - 1))) % 7).astype(np.uint64)
            pat |= d << np.uint64(shift)
        return ((base & ~clear)[:, None] | pat[None, :]).astype(np.int64)

    def _expand_s2(group: np.ndarray, r_cur: int) -> np.ndarray:
        depth = res - r_cur
        n = 4 ** depth
        u = group.astype(np.uint64)
        lsb = u & (~u + np.uint64(1))
        new_lsb = np.uint64(1) << np.uint64(2 * (30 - res))
        step = np.uint64(2) << np.uint64(2 * (30 - res))
        start = u - lsb + new_lsb
        return (start[:, None]
                + step * np.arange(n, dtype=np.uint64)[None, :]).astype(np.int64)

    def _expand_geohash(group: np.ndarray, r_cur: int) -> np.ndarray:
        """32-ary prefix tree: bits' = bits << 5·depth | pattern."""
        depth = res - r_cur
        n = 32 ** depth
        bits = (group.astype(np.uint64) >> np.uint64(4))
        pat = np.arange(n, dtype=np.uint64)
        kids = (bits[:, None] << np.uint64(5 * depth)) | pat[None, :]
        return ((kids << np.uint64(4)) | np.uint64(res)).astype(np.int64)

    def _expand_rhp(group: np.ndarray, r_cur: int) -> np.ndarray:
        """9-ary: bits' = bits·9^depth + pattern."""
        depth = res - r_cur
        n = 9 ** depth
        bits = (group.astype(np.int64) >> 4)
        pat = np.arange(n, dtype=np.int64)
        kids = bits[:, None] * np.int64(n) + pat[None, :]
        return (kids << 4) | np.int64(res)

    def _expand_a5(group: np.ndarray, r_cur: int) -> np.ndarray:
        """Aperture 5-then-4: append base-4 digits below the existing
        MSB-aligned field (and enumerate the 5 quintants when expanding
        a res-0 pentagon)."""
        base = (group & ~(np.int64(0x1F) << np.int64(55))) | np.int64(
            res << 55)
        shift = np.int64(52 - 2 * (res - 1)) if res >= 2 else np.int64(52)
        nd = 4 ** max(res - max(r_cur, 1), 0)
        dig = np.arange(nd, dtype=np.int64) << shift
        if r_cur == 0:
            q = np.arange(5, dtype=np.int64) << np.int64(52)
            pat = (q[:, None] | dig[None, :]).ravel()
        else:
            pat = dig
        return base[:, None] | pat[None, :]

    def _expand_i4r(group: np.ndarray, r_cur: int) -> np.ndarray:
        """Aperture-4 rhombus: per-axis bit append (row/col fields)."""
        depth = res - r_cur
        side = 1 << depth
        d = (group >> np.int64(57)) & np.int64(0xF)
        row = (group >> np.int64(26)) & np.int64(0x3FFFFFF)
        col = group & np.int64(0x3FFFFFF)
        dr = np.repeat(np.arange(side, dtype=np.int64), side)
        dc = np.tile(np.arange(side, dtype=np.int64), side)
        rows = (row[:, None] << depth) | dr[None, :]
        cols = (col[:, None] << depth) | dc[None, :]
        return ((d[:, None] << np.int64(57))
                | np.int64(res << 52)
                | (rows << np.int64(26)) | cols)

    def _expand_i9r(group: np.ndarray, r_cur: int) -> np.ndarray:
        """Aperture-9 rhombus: per-axis base-3 digit append."""
        depth = res - r_cur
        side = 3 ** depth
        d = (group >> np.int64(57)) & np.int64(0xF)
        row = (group >> np.int64(26)) & np.int64(0x3FFFFFF)
        col = group & np.int64(0x3FFFFFF)
        dr = np.repeat(np.arange(side, dtype=np.int64), side)
        dc = np.tile(np.arange(side, dtype=np.int64), side)
        rows = row[:, None] * np.int64(side) + dr[None, :]
        cols = col[:, None] * np.int64(side) + dc[None, :]
        return ((d[:, None] << np.int64(57))
                | np.int64(res << 52)
                | (rows << np.int64(26)) | cols)

    def _expand_quadkey(group: np.ndarray, r_cur: int) -> np.ndarray:
        """4-ary quadtree: bits' = bits << 2·depth | pattern (5-bit
        level field)."""
        depth = res - r_cur
        n = 4 ** depth
        bits = (group.astype(np.int64) >> 5)
        pat = np.arange(n, dtype=np.int64)
        kids = (bits[:, None] << np.int64(2 * depth)) | pat[None, :]
        return (kids << 5) | np.int64(res)

    expanders = {"hex7": _expand_hex7, "s2": _expand_s2,
                 "geohash": _expand_geohash, "rhp": _expand_rhp,
                 "a5": _expand_a5, "i4r": _expand_i4r,
                 "i9r": _expand_i9r, "e4r": _expand_i4r,
                 "e9r": _expand_i9r, "quadkey": _expand_quadkey}

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from raster2dggs_spark.dggs import h3lib, s2lib

        for pdf in batches:
            if not len(pdf):
                continue
            cells = pdf[cell_col].values
            if dggs == "hex7":
                cr = h3lib.get_resolution(cells)
            elif dggs == "s2":
                cr = s2lib.cell_level(cells)
            elif dggs == "a5":
                cr = (np.asarray(cells, dtype=np.int64) >> 55) & 0x1F
            elif dggs in ("i4r", "i9r", "e4r", "e9r"):
                cr = (np.asarray(cells, dtype=np.int64) >> 52) & 0x1F
            elif dggs == "quadkey":  # 5-bit level field
                cr = (np.asarray(cells, dtype=np.int64) & 0x1F)
            else:  # geohash/rhp: packed res nibble
                cr = (np.asarray(cells, dtype=np.int64) & 0xF)
            out_cells = []
            out_idx = []
            idx = np.arange(len(cells))
            for r_cur in np.unique(cr):
                m = cr == r_cur
                group = cells[m].astype(np.int64)
                if r_cur == res:
                    out_cells.append(group)
                    out_idx.append(idx[m])
                    continue
                kids = expanders[dggs](group, int(r_cur))
                out_cells.append(kids.ravel())
                out_idx.append(np.repeat(idx[m], kids.shape[1]))
            cells_all = np.concatenate(out_cells)
            idx_all = np.concatenate(out_idx)
            data = {cell_col: cells_all}
            for c in other:
                data[c] = pdf[c].values[idx_all]
            yield pd.DataFrame(data)

    return df.mapInPandas(fn, schema)


def compact_cells_3h(df: DataFrame, value_cols: list[str], res: int,
                     min_res: int = 0,
                     cell_col: str = "cell") -> DataFrame:
    """A17 — multi-parent compaction for the aperture-3 ``i3h`` grid
    (ref semantics: dggalrasterindexer.py:236-372, `_compaction_3h`).

    On refinement-ratio-3 hex grids children do not nest: a parent's 7
    children are its center child plus its 6 VERTEX children, each
    vertex child shared by 3 parents.  Per level, fine → coarse:

    1. a parent compacts iff ALL 7 of its children are present with
       identical values (vertex children may contribute to several
       parents simultaneously);
    2. a child is removed iff EVERY one of its parents compacted;
    3. compacted parents join the active set (eligible next level).

    The reference runs this as a driver-side dict fixpoint; here each
    level is three bounded shuffles over a shrinking frame — the child→
    parents edge explode (vectorized lattice arithmetic, ≤3 edges/row),
    the per-parent completeness+uniformity aggregate, and the per-child
    all-parents-compacted aggregate — with a localCheckpoint per level
    (the kNN-loop plan hygiene).  Seam parents (some expected children
    on a neighbouring face) never reach 7 present children and are
    conservatively left uncompacted.

    Input: single-resolution frame at ``res``.  Output: mixed
    resolutions in [min_res, res] (ids carry their res)."""
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    val_struct = F.struct(*[F.col(c) for c in value_cols])
    active = df.select(F.col(cell_col), val_struct.alias("__v"))

    def _parents_of(c):
        from raster2dggs_spark.dggs import i3hlib

        cells = c.values.astype(np.int64)
        par = i3hlib.cell_to_parents(cells)          # (n, 3)
        return pd.Series([row[row != i3hlib.NO_PARENT]
                          for row in par])

    parents_of = F.pandas_udf(_parents_of, T.ArrayType(T.LongType()))

    for r in range(res, min_res, -1):
        lv = active.where(
            (F.shiftrightunsigned(F.col(cell_col), 54)
             .bitwiseAND(F.lit(0x1F))) == r
        )
        rest = active.where(
            (F.shiftrightunsigned(F.col(cell_col), 54)
             .bitwiseAND(F.lit(0x1F))) != r
        )

        # child -> parents explode as a column-native posexplode over a
        # vectorized parent-array UDF: child VALUES stay on the row, so
        # the former (edge UDF -> shuffle join back to lv) round trip —
        # one exchange + a cached edge frame per level — disappears;
        # the persist only saves the cheap UDF from running twice
        # (parent aggregate + removal pass)
        e = lv.select(cell_col, "__v",
                      F.explode(parents_of(F.col(cell_col)))
                      .alias("__parent")).persist()
        stats = e.groupBy("__parent").agg(
            F.count(F.lit(1)).alias("__n"),
            F.count_distinct(F.col("__v")).alias("__d"),
            F.first("__v").alias("__fv"),
        )
        comp = stats.where((F.col("__n") == 7) & (F.col("__d") == 1)) \
                    .select("__parent", "__fv")
        # child removed iff ALL its parents compacted — ONE aggregate
        # over the flag-joined edges (total vs compacted-parent count)
        flagged = e.select(cell_col, "__parent").join(
            comp.select("__parent").withColumn("__c", F.lit(1)),
            "__parent", "left",
        )
        per_child = flagged.groupBy(cell_col).agg(
            F.count(F.lit(1)).alias("__t"),
            F.sum(F.coalesce(F.col("__c"), F.lit(0))).alias("__m"),
        )
        removed = per_child.where(F.col("__t") == F.col("__m")) \
                           .select(cell_col)
        kept = lv.join(removed, cell_col, "left_anti")
        parents = comp.select(
            F.col("__parent").alias(cell_col), F.col("__fv").alias("__v")
        )
        active = rest.unionByName(kept).unionByName(parents) \
                     .localCheckpoint(eager=True)
        e.unpersist()
    return active.select(
        cell_col, *[F.col("__v")[c].alias(c) for c in value_cols]
    )
