from raster2dggs_spark.sources.images import (
    generate_images_pdf,
    images_spark_df,
    write_images_table,
    IMAGE_SCHEMA,
)
from raster2dggs_spark.sources.icetable import IceTable

__all__ = [
    "generate_images_pdf",
    "images_spark_df",
    "write_images_table",
    "IMAGE_SCHEMA",
    "IceTable",
]
