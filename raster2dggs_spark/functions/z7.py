"""Z7-style compact id recoding for the hex7 grid (round 6).

DGGAL's ``isea7h_z7`` variant (ref indexers/dggalrasterindexer.py
registry) is the one *id-layout* (not projection) variant family: the
same aperture-7 hexagon tree addressed by a compact base-7 positional
id instead of the H3 fill-digit layout.  This module provides the
bijective recoding for our hex7 ids as PURE Column bit/integer
arithmetic — zero Python in the plan:

    z7 = 1<<60 | (base_cell ·7^res + Σ digit_i ·7^(res-i)) << 4 | res

(the 1<<60 mode tag keeps every id strictly positive — base cell 0 at
res 0 would otherwise be id 0).  The payload 122·7^15·16 ≈ 9.3e15 <
2^53, so every division in the inverse is exact in doubles (the rhp
parent_expr precedent).  ``res``
must be supplied (cells at uniform res — same contract as the geohash
parent_expr): the fill digits of the source layout are not inspected.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def hex7_to_z7(cell_col, res: int):
    """Column: hex7 id (H3 bit layout) → compact z7 id at ``res``."""
    c = F.col(cell_col) if isinstance(cell_col, str) else cell_col
    z = F.shiftrightunsigned(c, 45).bitwiseAND(F.lit(0x7F))  # base cell
    for i in range(1, res + 1):
        d = F.shiftrightunsigned(c, 3 * (15 - i)).bitwiseAND(F.lit(7))
        z = (z * F.lit(7) + d).cast("long")
    return F.shiftleft(z, 4).bitwiseOR(F.lit(res)).bitwiseOR(
        F.lit(1 << 60))


def z7_to_hex7(z7_col, res: int):
    """Column: compact z7 id → hex7 id (H3 bit layout) at ``res``."""
    z = F.col(z7_col) if isinstance(z7_col, str) else z7_col
    bits = F.shiftrightunsigned(z.bitwiseAND(F.lit(~(1 << 60))), 4)
    # peel digits fine→coarse with exact double floor-div
    out = F.lit((1 << (3 * (15 - res))) - 1)  # 7-fill below res
    for i in range(res, 0, -1):
        d = (bits - F.floor(bits / F.lit(7)).cast("long") * F.lit(7))
        out = out.bitwiseOR(F.shiftleft(d.cast("long"), 3 * (15 - i)))
        bits = F.floor(bits / F.lit(7)).cast("long")
    base = bits  # what remains is the base cell
    mode_res = (1 << 59) | (res << 52)
    return out.bitwiseOR(F.shiftleft(base, 45)).bitwiseOR(F.lit(mode_res))


def hex7_to_z7_np(cells: np.ndarray, res: int) -> np.ndarray:
    """NumPy twin (tests/oracle replays)."""
    c = np.asarray(cells, dtype=np.int64)
    z = (c >> np.int64(45)) & np.int64(0x7F)
    for i in range(1, res + 1):
        d = (c >> np.int64(3 * (15 - i))) & np.int64(7)
        z = z * np.int64(7) + d
    return (z << np.int64(4)) | np.int64(res) | np.int64(1 << 60)


def z7_to_hex7_np(z7: np.ndarray, res: int) -> np.ndarray:
    c = np.asarray(z7, dtype=np.int64) & ~np.int64(1 << 60)
    bits = c >> np.int64(4)
    out = np.full(c.shape, (1 << (3 * (15 - res))) - 1, dtype=np.int64)
    for i in range(res, 0, -1):
        out |= (bits % np.int64(7)) << np.int64(3 * (15 - i))
        bits = bits // np.int64(7)
    return out | (bits << np.int64(45)) | np.int64((1 << 59) | (res << 52))
