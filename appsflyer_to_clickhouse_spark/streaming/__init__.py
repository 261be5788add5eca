"""Structured Streaming operators (SURVEY.md §2 Part C row 7)."""

from .dedup import run_availablenow_to_memory, stream_dedup_watermark  # noqa: F401
