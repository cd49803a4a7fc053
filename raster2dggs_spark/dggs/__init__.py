from raster2dggs_spark.dggs import h3lib, s2lib

__all__ = ["h3lib", "s2lib"]
