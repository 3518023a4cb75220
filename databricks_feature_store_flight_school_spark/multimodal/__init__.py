from .binary import (
    FEATURE_DIM,
    MEDIA_META_SCHEMA,
    attach_media_meta,
    decode_image_batch,
    extract_features,
    frame_sample,
    read_binary_files,
)

__all__ = [
    "FEATURE_DIM",
    "MEDIA_META_SCHEMA",
    "attach_media_meta",
    "decode_image_batch",
    "extract_features",
    "frame_sample",
    "read_binary_files",
]
