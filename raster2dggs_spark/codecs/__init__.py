from raster2dggs_spark.codecs.image import (
    encode_image,
    decode_image,
    psnr_db,
    average_hash64,
    FORMATS,
)
from raster2dggs_spark.codecs.media import (
    encode_video,
    decode_video,
    video_meta,
    encode_audio,
    decode_audio,
)

__all__ = [
    "encode_image", "decode_image", "psnr_db", "average_hash64", "FORMATS",
    "encode_video", "decode_video", "video_meta",
    "encode_audio", "decode_audio",
]
