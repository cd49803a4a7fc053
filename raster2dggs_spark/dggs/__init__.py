from raster2dggs_spark.dggs import (
    a5lib,
    quadkeylib,
    e4rlib,
    e9rlib,
    i4rlib,
    i9rlib,
    geohashlib,
    h3lib,
    i3hlib,
    maidenheadlib,
    rhplib,
    s2lib,
)

__all__ = ["h3lib", "s2lib", "geohashlib", "maidenheadlib", "rhplib",
           "i3hlib", "a5lib", "i4rlib", "i9rlib", "e4rlib", "e9rlib",
           "check_grid"]

# i3h: aperture-3 hex (ISEA3H layout, multi-parent hierarchy) — encode/
# cover/A17 surfaces; ids are this repo's own (see i3hlib), like hex7.
# a5: pentagonal dodecahedron, aperture 5 then 4 (A5 layout, see a5lib);
# i4r: icosahedral aperture-4 rhombus (ISEA4R layout, see i4rlib)
# i9r: the aperture-9 sibling on the same 10-diamond layout (ISEA9R,
# see i9rlib); e4r: the EQUAL-AREA aperture-4 sibling (IVEA/ISEA class,
# see e4rlib; e9r its aperture-9 twin) — same honest own-id contract.
GRIDS = ("hex7", "s2", "geohash", "maidenhead", "rhp", "i3h", "a5",
         "i4r", "i9r", "e4r", "e9r", "quadkey")


def check_grid(dggs: str) -> str:
    """Validate a grid key at the output-contract level.

    ``"h3"`` is rejected loudly: the hexagonal grid here is an
    H3-*layout* grid (same bit layout, aperture-7 hierarchy, 122 base
    cells) whose base-cell numbering is derived geometrically, NOT
    libh3's — its ids do not join against real-world H3-indexed data, so
    no output may claim the ``h3`` label (grid key and output columns
    are ``hex7``)."""
    if dggs == "h3":
        raise ValueError(
            "grid 'h3' is not available: cell ids here use an H3-layout "
            "geometry but are NOT libh3-interoperable. Use dggs='hex7' "
            "(outputs hex7_NN columns) — joining hex7 ids against "
            "genuine H3 indexes would silently mismatch."
        )
    if dggs not in GRIDS:
        raise ValueError(f"unknown dggs {dggs!r}; expected one of {GRIDS}")
    return dggs
