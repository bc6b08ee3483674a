from fever_spark.multimodal.binary import (
    MEDIA_SCHEMA, decode_media, extract_features, resize_images, sample_frames,
)

__all__ = ["MEDIA_SCHEMA", "decode_media", "extract_features", "resize_images",
           "sample_frames"]
