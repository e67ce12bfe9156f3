from energydatalake_spark.multimodal.media import (
    attach_fake_media,
    decode_media,
    media_embedding,
    sample_frames,
)

__all__ = ["attach_fake_media", "decode_media", "media_embedding", "sample_frames"]
