"""Vector geometry operators (polyline surface).

The reference consumes vector geometries only as join targets
(vector2dggs sibling); a production raster+vector engine also needs to
*produce* lighter vector output.  This module adds Ramer-Douglas-Peucker
polyline simplification as a distributed operator: each line is an
independent task (applyInPandas over the line key — scale = number of
lines, never line length x lines), and every keep/drop decision is a
deterministic comparison so the DuckDB oracle can replay the exact
split tree level by level.

Determinism contract (shared with the oracle twin):
- the split vertex of a segment is the max-deviation vertex, ties going
  to the SMALLEST seq;
- a segment splits iff its max deviation is STRICTLY greater than eps;
- a zero-length chord (closed ring: first == last vertex) measures
  deviation as distance to the chord anchor point, as in standard RDP
  implementations;
- with integer coordinates and an integer eps every comparison is exact
  int64 arithmetic (cross^2 vs eps^2 * |chord|^2 — no sqrt, no floats),
  so two engines cannot disagree at decision boundaries.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def simplify_lines(df: DataFrame, eps: float, id_col: str = "line_id",
                   seq_col: str = "seq", x_col: str = "x",
                   y_col: str = "y") -> DataFrame:
    """Ramer-Douglas-Peucker simplification of vertex tables
    ``(line_id, seq, x, y)`` -> the kept vertices, same schema.

    Plan: one groupBy(line) applyInPandas — per-line stack-based RDP on
    NumPy arrays.  Lines are mutually independent, so a 100-TB vertex
    table partitions by line id with no cross-task state; a single
    pathological giant line is the only skew axis (bound line length
    upstream with line_cells-style tiling if needed).

    Exactness: when the coordinates are integral, |coords| < 2^20 and
    eps is an integer, the deviation test runs entirely in int64
    (cross^2 <= (2*2^20*2^21)^2 < 2^63) — bit-identical to the SQL
    twin; otherwise float64 with the same tie-break order.
    """
    if eps < 0:
        raise ValueError("eps must be >= 0")
    cols = [id_col, seq_col, x_col, y_col]
    sub = df.select(*cols)
    schema = sub.schema

    def _dp(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(seq_col).reset_index(drop=True)
        n = len(pdf)
        if n <= 2:
            return pdf
        xr = pdf[x_col].to_numpy()
        yr = pdf[y_col].to_numpy()
        integral = (np.issubdtype(xr.dtype, np.integer)
                    and np.issubdtype(yr.dtype, np.integer)
                    and float(eps).is_integer()
                    and max(np.abs(xr).max(), np.abs(yr).max()) < (1 << 20))
        if integral:
            x = xr.astype(np.int64)
            y = yr.astype(np.int64)
            e2 = np.int64(int(eps) * int(eps))
        else:
            x = xr.astype(np.float64)
            y = yr.astype(np.float64)
            e2 = float(eps) * float(eps)
        keep = np.zeros(n, dtype=bool)
        keep[0] = keep[-1] = True
        stack = [(0, n - 1)]
        while stack:
            s, e = stack.pop()
            if e - s < 2:
                continue
            dx = x[e] - x[s]
            dy = y[e] - y[s]
            len2 = dx * dx + dy * dy
            xi = x[s + 1:e]
            yi = y[s + 1:e]
            if len2 == 0:
                m = (xi - x[s]) ** 2 + (yi - y[s]) ** 2
                thr = e2
            else:
                cr = dx * (yi - y[s]) - dy * (xi - x[s])
                m = cr * cr
                thr = e2 * len2
            b = int(np.argmax(m))  # first max -> smallest seq on ties
            if m[b] > thr:
                v = s + 1 + b
                keep[v] = True
                stack.append((s, v))
                stack.append((v, e))
        return pdf[keep]

    return sub.groupBy(id_col).applyInPandas(_dp, schema)
