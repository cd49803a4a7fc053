"""Branch-free Morton (Z-order) bit interleave helpers.

The per-bit interleave loops previously used by quadkeylib/geohashlib
cost 4 array passes PER BIT (up to ~90 passes at level 23); the
standard magic-mask spread/compress does the whole word in 5 masked
shifts each way — bit-identical output, ~10-15x fewer passes (round 8).

Inputs are non-negative indices below 2^32 (tile/lat/lon quantizations
are <= 30 bits everywhere in this engine).
"""

from __future__ import annotations

import numpy as np

_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_M8 = np.uint64(0x00FF00FF00FF00FF)
_M16 = np.uint64(0x0000FFFF0000FFFF)
_M32 = np.uint64(0x00000000FFFFFFFF)


def spread(x) -> np.ndarray:
    """Insert a zero bit above every bit of ``x`` (uint64): bit k of the
    input lands at bit 2k of the output."""
    x = np.asarray(x).astype(np.uint64)
    x = (x | (x << np.uint64(16))) & _M16
    x = (x | (x << np.uint64(8))) & _M8
    x = (x | (x << np.uint64(4))) & _M4
    x = (x | (x << np.uint64(2))) & _M2
    x = (x | (x << np.uint64(1))) & _M1
    return x


def compress(x) -> np.ndarray:
    """Inverse of :func:`spread`: keep the even-position bits of ``x``
    and pack them down (bit 2k of the input lands at bit k)."""
    x = np.asarray(x).astype(np.uint64) & _M1
    x = (x | (x >> np.uint64(1))) & _M2
    x = (x | (x >> np.uint64(2))) & _M4
    x = (x | (x >> np.uint64(4))) & _M8
    x = (x | (x >> np.uint64(8))) & _M16
    x = (x | (x >> np.uint64(16))) & _M32
    return x
