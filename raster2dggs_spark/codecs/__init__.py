from raster2dggs_spark.codecs.image import (
    encode_image,
    decode_image,
    psnr_db,
    average_hash64,
    FORMATS,
)

__all__ = ["encode_image", "decode_image", "psnr_db", "average_hash64", "FORMATS"]
