from raster2dggs_spark.functions.resolution import (
    cell_area_m2_mean,
    resolve_resolution,
)

__all__ = ["cell_area_m2_mean", "resolve_resolution"]
