"""Multimodal column support (SURVEY.md §2 Part C row 5)."""

from .cdc import cdc_chunk_digests  # noqa: F401
from .columns import (  # noqa: F401
    attach_binary_payload,
    decode_image,
    extract_binary_features,
    extract_binary_features_arrow,
    group_binary_fingerprint,
    read_binary_dir,
    sample_frame_offsets,
)
