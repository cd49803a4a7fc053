from raster2dggs_spark.geo.affine import (
    pixel_centers_lonlat,
    apply_affine,
    invert_affine,
)
from raster2dggs_spark.geo.crs import (
    mercator_to_lonlat,
    lonlat_to_mercator,
    to_lonlat,
    from_lonlat,
    tm_for_epsg,
    haversine_m,
    geodesic_row_areas_m2,
    EARTH_RADIUS_M,
)

__all__ = [
    "pixel_centers_lonlat",
    "apply_affine",
    "invert_affine",
    "mercator_to_lonlat",
    "lonlat_to_mercator",
    "to_lonlat",
    "from_lonlat",
    "tm_for_epsg",
    "haversine_m",
    "geodesic_row_areas_m2",
    "EARTH_RADIUS_M",
]
