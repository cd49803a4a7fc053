"""Resolution auto-modes (reference F9: /root/reference/raster2dggs/
common.py:67-122, invariants tests/classes/test_resolution_modes.py:
152-217): choose the output resolution by comparing mean cell area to
the raster's mean pixel area.

Driver-side pure Python — no Spark involved.
"""

from __future__ import annotations

import numpy as np

EARTH_AREA_M2 = 4.0 * np.pi * 6371007.1809**2


def n_cells(res: int, dggs: str = "hex7") -> int:
    # our H3 layout is uniformly 7-ary over 122 base cells; S2: 6*4^level;
    # rHEALPix: 6 faces * 9^res (equal-area by construction)
    if dggs == "hex7":
        return 122 * 7**res
    if dggs == "rhp":
        return 6 * 9**res
    if dggs == "i3h":
        # aperture 3 over the same icosahedral lattice density as hex7
        # res 0 (~122 res-0 cells globally)
        return 122 * 3**res
    if dggs == "a5":
        # 12 pentagons; aperture 5 for res 0→1, aperture 4 thereafter
        # (ref tests/regression/test_a5_cell_to_children_size.py)
        return 12 if res == 0 else 60 * 4 ** (res - 1)
    if dggs == "i4r":
        return 10 * 4 ** res  # 10 icosahedral diamonds, aperture 4
    if dggs == "i9r":
        return 10 * 9 ** res  # same diamonds, aperture 9
    if dggs == "e4r":
        return 10 * 4 ** res  # equal-area diamonds, aperture 4
    if dggs == "e9r":
        return 10 * 9 ** res  # equal-area diamonds, aperture 9
    if dggs == "quadkey":
        return 4 ** res  # web-mercator quadtree (covers |lat|<=85.05)
    return 6 * 4**res


def cell_area_m2_mean(res: int, dggs: str = "hex7") -> float:
    """Mean cell area at ``res`` (exact: cells partition the sphere —
    quadkey partitions the |lat| <= 85.05° Mercator band, whose area
    fraction is sin(85.05...°))."""
    if dggs == "quadkey":
        covered = EARTH_AREA_M2 * float(np.sin(np.radians(85.05112878))) / 2.0
        return covered * 2.0 / n_cells(res, dggs)
    return EARTH_AREA_M2 / n_cells(res, dggs)


def resolve_resolution(mode: str, mean_pixel_area_m2: float,
                       dggs: str = "hex7", max_res: int = 15) -> int:
    """Reference mode semantics:

    - ``smaller-than-pixel``: coarsest res whose cells are smaller than
      (or equal to) a pixel;
    - ``larger-than-pixel``: finest res whose cells are still larger than
      (or equal to) a pixel;
    - ``min-diff``: res whose cell area is closest to the pixel area.
    """
    if dggs == "s2":
        max_res = min(max_res, 30)
    if dggs == "a5":
        max_res = min(max_res, 27)
    if dggs == "quadkey":
        max_res = min(max_res, 23)
    if dggs == "i4r":
        max_res = min(max_res, 26)
    if dggs == "i9r":
        max_res = min(max_res, 16)
    if dggs == "e4r":
        max_res = min(max_res, 26)
    if dggs == "e9r":
        max_res = min(max_res, 16)
    areas = np.array([cell_area_m2_mean(r, dggs) for r in range(max_res + 1)])
    if mode == "smaller-than-pixel":
        ok = np.flatnonzero(areas <= mean_pixel_area_m2)
        if ok.size == 0:
            return max_res
        return int(ok[0])
    if mode == "larger-than-pixel":
        ok = np.flatnonzero(areas >= mean_pixel_area_m2)
        if ok.size == 0:
            return 0
        return int(ok[-1])
    if mode == "min-diff":
        return int(np.argmin(np.abs(areas - mean_pixel_area_m2)))
    raise ValueError(f"unknown mode {mode!r}")
