"""Scalar helpers (SURVEY.md §2.6 F1–F8)."""

from .names import (
    sanitize_identifier,
    table_name_from_path,
    lake_name_to_source_name,
    normalize_job_name,
)

__all__ = [
    "sanitize_identifier",
    "table_name_from_path",
    "lake_name_to_source_name",
    "normalize_job_name",
]
