from .codec import (  # noqa: F401
    MEDIA_SCHEMA,
    attach_binary_payload,
    extract_features,
    decode_image_stub,
    sample_frames_stub,
)
