"""Name-derivation scalar functions (SURVEY.md §2.6).

These run on *control metadata* (column names, paths, job names) so they
stay plain Python; the data-plane analogs (applied to columns) are the
built-ins noted per function.
"""

from __future__ import annotations

# Exact character class the reference strips for Parquet-legal
# identifiers (``utils.py:59``): , ; { } ( ) \n \t =
PARQUET_INVALID_CHARS = ",;{}()\n\t="


def sanitize_identifier(name: str) -> str:
    """F1 (``utils.py:55-66``): strip, spaces→underscore, drop the
    parquet-invalid character class. Data-plane analog: ``F.translate`` /
    ``F.regexp_replace``."""
    out = name.strip().replace(" ", "_")
    out = out.translate({ord(c): None for c in PARQUET_INVALID_CHARS})
    # Removing invalid chars can expose leading/trailing control
    # whitespace (e.g. "0\x1f{" -> "0\x1f"); strip once more.
    return out.strip()


def table_name_from_path(path: str) -> str:
    """F2 (``utils.py:123,201``): substring after the last '/'.
    Data-plane analog: ``F.substring_index(col, '/', -1)``."""
    return path.rstrip("/").rsplit("/", 1)[-1]


def lake_name_to_source_name(lake_name: str) -> str:
    """F3 (``reporting_utils.py:65``): lake ``schema_table`` →
    source ``schema.table``."""
    return lake_name.replace("_", ".", 1)


def normalize_job_name(table: str, prefix: str = "") -> str:
    """F4 (``dependency_utils.py:26,28``): lowercase; optional source
    prefix prepended (the reference hard-coded ``nis_``)."""
    return f"{prefix}{table.strip().lower()}"
