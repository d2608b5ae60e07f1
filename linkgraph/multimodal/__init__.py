from linkgraph.multimodal.media import (
    MEDIA_SCHEMA,
    decode_images,
    extract_features,
    sample_frames,
    synthetic_media,
)

__all__ = [
    "MEDIA_SCHEMA",
    "synthetic_media",
    "decode_images",
    "extract_features",
    "sample_frames",
]
