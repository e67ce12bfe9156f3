from energydatalake_spark.multimodal.media import (
    attach_fake_media,
    attach_png_media,
    decode_media,
    decode_png,
    encode_png,
    media_embedding,
    sample_frames,
)

__all__ = [
    "attach_fake_media",
    "attach_png_media",
    "decode_media",
    "decode_png",
    "encode_png",
    "media_embedding",
    "sample_frames",
]
