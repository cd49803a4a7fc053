from raster2dggs_spark.dggs import geohashlib, h3lib, maidenheadlib, s2lib

__all__ = ["h3lib", "s2lib", "geohashlib", "maidenheadlib"]
