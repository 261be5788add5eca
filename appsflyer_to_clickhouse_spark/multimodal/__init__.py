"""Multimodal column support (SURVEY.md §2 Part C row 5)."""

from .columns import (  # noqa: F401
    attach_binary_payload,
    decode_image,
    extract_binary_features,
    read_binary_dir,
    sample_frame_offsets,
)
