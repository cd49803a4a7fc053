"""Exact Euclidean distance transform / allocation on the cell lattice.

The GIS proximity workflow (``gdal_proximity.py``, ArcGIS
EuclideanDistance / EuclideanAllocation, GRASS ``r.grow.distance``):
given a set of SOURCE cells on a rectangle-grid DGGS lattice
(geohash / quadkey), compute for every cell the exact squared planar
lattice distance to the nearest source — and, with ``id_col``, WHICH
source wins, ties broken to the minimum source id via the exact
lexicographic (distance^2, id) order (the repo's total-order rule).
The reference (raster2dggs) stops at per-cell indexing/aggregation;
proximity is — with cost distance — the other canonical *global*
lattice operation users run on the result (buffer zones, service
areas, nearest-facility labelling, riparian setbacks).

Distances are squared integer lattice distances (``d2``), bit-exact
across engines and evaluation orders — exactly gdal_proximity's pixel
geometry (planar, no antimeridian wrap; multiply by the cell pitch for
ground units).  Cells are points at their lattice coordinates; the
input need NOT be a dense rectangle (holes and ragged domains are
fine — distance is geometric, not path-based; for path semantics see
``operators/costdist.py``).

Distributed algorithm — separable lower envelope
------------------------------------------------
The exact EDT is separable (Felzenszwalb & Huttenlocher 2004, "Distance
Transforms of Sampled Functions"):

    d2(x, y) = min_j (x - cx_j)^2 + g(cx_j, y)^2
    g(c, y)  = min over sources in column c of |y - sy|

1. **Column pass** — sources collapse to one row per source COLUMN
   (gx -> sorted source rows + ids): shuffle volume = #sources, far
   below cell count.  ``g`` per (row, column) is two ``searchsorted``
   neighbours, vectorized over all rows at once.
2. **Row pass** — per lattice row, the 1D lower envelope of the
   per-column parabolas, computed by the Felzenszwalb-Huttenlocher
   hull scan with EXACT integer breakpoints (Python-int rationals:
   the first integer x where parabola j lex-beats the hull top, ids
   folded into the breakpoint) — the (d2, id) tie-break is exact with
   no float anywhere in a decision, and evaluation per cell is one
   ``searchsorted`` + one vectorized int64 polynomial.

Two physical strategies (``strategy=``, default ``auto`` via a bounded
``limit(threshold+1).count()`` probe — the sample.py idiom):

- ``collect`` — small source sets (<= ``broadcast_threshold``): the
  per-column summary ships to executors as a Spark broadcast; the big
  cell side is ONE ``mapInPandas`` pass, zero shuffles.  Hard-guarded:
  a forced collect above the threshold raises instead of quietly
  OOMing the driver.
- ``join`` — large source sets: the per-column summary table stays
  distributed; only the (small) distinct lattice ROW set is broadcast
  onto it, each summary partition evaluates its columns' ``g`` against
  every row map-side, and ONE shuffle cogroups cells with their row's
  parabolas by ``gy``; the envelope runs per row group.  Each source
  column contributes exactly #rows parabola records (the dense-FH
  intermediate, O(rows x source-columns) — the exact-EDT lower bound
  when the sources themselves aren't broadcastable); cells shuffle
  once.  The row set is bounded by raster HEIGHT, not raster size
  (``max_rows`` guards the degenerate fine-global-lattice case with an
  actionable error: tile the raster or compact the sources).

At 100 TB the state is one row per CELL (already aggregated); the
row-pass group is one lattice row (bounded by raster width, not raster
size), so parallelism = #rows and no group exceeds tens of MB even on
continental mosaics.  Sources at raster density should be compacted
first (their EDT is ~0 everywhere anyway).

Ref: raster2dggs stops at per-cell ops (common.py pipeline); proximity
has no reference twin — semantics pinned against gdal_proximity /
ArcGIS EuclideanAllocation docs and a brute-force oracle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from raster2dggs_spark.operators.focal import lattice_indices

_NO_ID = np.iinfo(np.int64).max     # lex-max sentinel (never a real id)

# flush budget for the (rows-in-chunk x source-columns) g matrix
_G_BUDGET = 4_000_000


def _column_summary(pdf: pd.DataFrame, with_ids: bool):
    """Sorted per-column source summaries from a (gx, gy[, sid]) frame.

    Returns (cols, offs, sys, ids): distinct source columns ascending,
    CSR offsets into the per-column row arrays (rows ascending within
    a column), and the aligned ids (ones if ``not with_ids``)."""
    gx = pdf["gx"].to_numpy(np.int64)
    gy = pdf["gy"].to_numpy(np.int64)
    sid = (pdf["sid"].to_numpy(np.int64) if with_ids
           else np.ones(len(pdf), np.int64))
    order = np.lexsort((gy, gx))
    gx, gy, sid = gx[order], gy[order], sid[order]
    cols, starts = np.unique(gx, return_index=True)
    offs = np.concatenate([starts, [len(gx)]]).astype(np.int64)
    return cols, offs, gy, sid


def _column_g(ys: np.ndarray, cols, offs, sys, ids, with_ids: bool):
    """Vectorized column pass: for every target row in ``ys`` (ascending
    int64) and every source column, the min |dy| and its lex-min id.

    Returns (g, gid) of shape (len(ys), len(cols)); gid is the minimum
    id among the (<= 2) column sources at exactly that distance."""
    ny, m = len(ys), len(cols)
    g = np.empty((ny, m), np.int64)
    gid = np.empty((ny, m), np.int64) if with_ids else None
    for j in range(m):
        s = sys[offs[j]:offs[j + 1]]
        pos = np.searchsorted(s, ys)
        lo = np.clip(pos - 1, 0, len(s) - 1)
        hi = np.clip(pos, 0, len(s) - 1)
        dlo = np.abs(ys - s[lo])
        dhi = np.abs(s[hi] - ys)
        g[:, j] = np.minimum(dlo, dhi)
        if with_ids:
            i = ids[offs[j]:offs[j + 1]]
            gid[:, j] = np.where(dlo < dhi, i[lo],
                                 np.where(dhi < dlo, i[hi],
                                          np.minimum(i[lo], i[hi])))
    return g, gid


def _row_envelope(xs: np.ndarray, cols: np.ndarray, g_row: np.ndarray,
                  gid_row, with_ids: bool):
    """Exact 1D lower envelope: d2(x) = min_j (x - cols[j])^2 + g_j^2,
    ties to the minimal id, for every target in ``xs`` (int64, any
    order).  ``cols`` must be strictly increasing (guaranteed by the
    ``np.unique``/``groupBy`` column passes).

    FH hull scan over the parabolas (common quadratic coefficient =>
    pairwise differences are linear in x, so dominance is one-way
    monotone and the envelope is a sorted sequence of segments).
    Breakpoints are the first INTEGER x where the incoming parabola
    lex-beats the hull top, computed in exact Python-int rationals —
    float never enters a decision, so (d2, id) tie-breaking is total
    and reproducible (a parabola whose only win is a single exact-tie
    integer point keeps a singleton segment).  Returns (d2, alloc)
    int64 arrays aligned with ``xs``."""
    m = len(cols)
    hs = [int(v) * int(v) for v in g_row]        # exact py-int g^2
    cs = [int(c) for c in cols]
    ids = ([int(v) for v in gid_row] if with_ids else [1] * m)

    hull: list[int] = []        # parabola indices on the envelope
    brk: list[int] = []         # brk[k] = first integer x of hull[k+1]

    def _first_win(j: int, k: int) -> int:
        """First integer x where parabola j lex-beats hull member k
        (cs[j] > cs[k]): f_j - f_k is linear with negative slope, so j
        wins for every x past the rational crossover num/den; at an
        exact integer crossover the tie goes to the smaller id."""
        num = (cs[j] * cs[j] + hs[j]) - (cs[k] * cs[k] + hs[k])
        den = 2 * (cs[j] - cs[k])
        x = -(-num // den)                       # ceil(num/den)
        if num % den == 0 and ids[j] >= ids[k]:
            x += 1                               # exact tie stays with k
        return x

    for j in range(m):
        placed = False
        while hull:
            x = _first_win(j, hull[-1])
            if brk and x <= brk[-1]:
                hull.pop()                       # top segment now empty
                brk.pop()
                continue
            hull.append(j)
            brk.append(x)
            placed = True
            break
        if not hull and not placed:
            hull.append(j)
    bks = np.asarray(brk, np.int64) if brk else np.empty(0, np.int64)
    seg = np.searchsorted(bks, xs, side="right")
    widx = np.asarray(hull, np.int64)[seg]
    dc = xs - cols[widx]
    d2 = dc * dc + g_row[widx] * g_row[widx]
    alloc = (np.asarray(ids, np.int64)[widx] if with_ids else None)
    return d2, alloc


def _edt_rows(pdf: pd.DataFrame, cols, offs, sys, ids,
              with_ids: bool) -> pd.DataFrame:
    """Evaluate d2 (+ alloc) for every cell in ``pdf`` against a full
    column summary — the collect-strategy kernel."""
    n = len(pdf)
    d2 = np.full(n, -1, np.int64)
    al = np.full(n, _NO_ID, np.int64)
    if len(cols) and n:
        gx = pdf["gx"].to_numpy(np.int64)
        gy = pdf["gy"].to_numpy(np.int64)
        order = np.argsort(gy, kind="stable")
        ys, starts = np.unique(gy[order], return_index=True)
        bounds = np.concatenate([starts, [n]])
        step = max(1, _G_BUDGET // max(len(cols), 1))
        for c0 in range(0, len(ys), step):
            c1 = min(c0 + step, len(ys))
            g, gid = _column_g(ys[c0:c1], cols, offs, sys, ids, with_ids)
            for r in range(c0, c1):
                rows_idx = order[bounds[r]:bounds[r + 1]]
                rd2, ral = _row_envelope(
                    gx[rows_idx], cols, g[r - c0],
                    gid[r - c0] if with_ids else None, with_ids)
                d2[rows_idx] = rd2
                if with_ids:
                    al[rows_idx] = ral
    out = pdf.copy()
    out["d2"] = pd.array(np.where(d2 < 0, 0, d2), dtype="Int64")
    out.loc[d2 < 0, "d2"] = pd.NA
    if with_ids:
        out["alloc"] = pd.array(np.where(al == _NO_ID, 0, al),
                                dtype="Int64")
        out.loc[al == _NO_ID, "alloc"] = pd.NA
    return out


def euclidean_distance(cells_df: DataFrame, source_col: str,
                       dggs: str = "geohash", cell_col: str = "cell",
                       id_col: str | None = None,
                       strategy: str = "auto",
                       broadcast_threshold: int = 2_000_000,
                       max_rows: int = 4_000_000) -> DataFrame:
    """Exact squared lattice distance from every cell to the nearest
    source cell (gdal_proximity / ArcGIS EuclideanDistance), plus the
    winning source id when ``id_col`` is given (EuclideanAllocation,
    ties to the minimal id via exact lex (d2, id)).

    Adds ``d2`` (long, NULL when the lattice has no sources) and,
    with ``id_col``, ``alloc`` (long).  See the module docstring for
    the two physical strategies.
    """
    if strategy not in ("auto", "collect", "join"):
        raise ValueError(f"strategy: auto | collect | join, got "
                         f"{strategy!r}")
    with_ids = id_col is not None
    lat = lattice_indices(cells_df, cell_col, dggs)
    sel = [F.col("gx"), F.col("gy")]
    if with_ids:
        sel.append(F.col(id_col).cast("long").alias("sid"))
    src = lat.filter(F.col(source_col).cast("boolean")).select(*sel)

    if strategy in ("auto", "collect"):
        n = src.limit(broadcast_threshold + 1).count()
        if n > broadcast_threshold:
            if strategy == "collect":
                raise ValueError(
                    f"strategy='collect' with >{broadcast_threshold} "
                    "source cells would ship the summary through the "
                    "driver; use strategy='join' (or compact the "
                    "sources to a coarser resolution first)")
            strategy = "join"
        else:
            strategy = "collect"

    sc = cells_df.sparkSession.sparkContext
    drop = ["gx", "gy", "gprec"]
    out_schema = T.StructType(
        list(cells_df.schema.fields)
        + [T.StructField("d2", T.LongType(), True)]
        + ([T.StructField("alloc", T.LongType(), True)]
           if with_ids else []))

    if strategy == "collect":
        bc = sc.broadcast(_column_summary(src.toPandas(), with_ids))

        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cols, offs, sys, ids = bc.value
            for b in batches:
                if not len(b):
                    continue
                yield _edt_rows(b, cols, offs, sys, ids,
                                with_ids).drop(columns=drop)

        return lat.mapInPandas(fn, out_schema)

    # -- join strategy: distributed column summary ------------------------
    # the row set is bounded by raster HEIGHT; hard-guard the collect
    rows_pdf = (lat.select("gy").distinct()
                .limit(max_rows + 1).toPandas())
    if len(rows_pdf) > max_rows:
        raise ValueError(
            f"euclidean_distance: >{max_rows} distinct lattice rows; "
            "tile the raster or compact the sources and retry")
    bc_rows = sc.broadcast(np.sort(rows_pdf["gy"].to_numpy(np.int64)))

    agg = F.sort_array(F.collect_list(
        F.struct(F.col("gy"),
                 (F.col("sid") if with_ids else F.lit(1)).alias("sid"))))
    scol = src.groupBy("gx").agg(agg.alias("ss"))

    g_schema = T.StructType([
        T.StructField("gy", T.LongType(), False),
        T.StructField("gx", T.LongType(), False),
        T.StructField("g", T.LongType(), False),
        T.StructField("gid", T.LongType(), False)])

    def g_eval(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ys = bc_rows.value
        for b in batches:
            if not len(b):
                continue
            b = b.sort_values("gx")
            cols_ = b["gx"].to_numpy(np.int64)
            lens = b["ss"].map(len).to_numpy(np.int64)
            offs_ = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
            flat = [e for s in b["ss"] for e in s]
            sys_ = np.fromiter((e["gy"] for e in flat), np.int64,
                               count=len(flat))
            ids_ = np.fromiter((e["sid"] for e in flat), np.int64,
                               count=len(flat))
            step = max(1, _G_BUDGET // max(len(cols_), 1))
            for c0 in range(0, len(ys), step):
                yc = ys[c0:c0 + step]
                g, gid = _column_g(yc, cols_, offs_, sys_, ids_, True)
                ny, m = g.shape
                yield pd.DataFrame({
                    "gy": np.repeat(yc, m),
                    "gx": np.tile(cols_, ny),
                    "g": g.ravel(),
                    "gid": gid.ravel()})

    gtab = scol.mapInPandas(g_eval, g_schema)

    def env(key, cpdf: pd.DataFrame, gpdf: pd.DataFrame) -> pd.DataFrame:
        out = cpdf.copy()
        if not len(gpdf):
            out["d2"] = pd.array([pd.NA] * len(out), dtype="Int64")
            if with_ids:
                out["alloc"] = pd.array([pd.NA] * len(out), dtype="Int64")
            return out.drop(columns=drop)
        gpdf = gpdf.sort_values("gx")
        d2, al = _row_envelope(
            out["gx"].to_numpy(np.int64),
            gpdf["gx"].to_numpy(np.int64),
            gpdf["g"].to_numpy(np.int64),
            gpdf["gid"].to_numpy(np.int64) if with_ids else None,
            with_ids)
        out["d2"] = pd.array(d2, dtype="Int64")
        if with_ids:
            out["alloc"] = pd.array(al, dtype="Int64")
        return out.drop(columns=drop)

    return (lat.groupBy("gy").cogroup(gtab.groupBy("gy"))
            .applyInPandas(env, out_schema))
