"""Schema-repair operators (P4, SURVEY.md §2.2).

The reference sanitized messy CSV headers into Parquet-legal identifiers
one ``withColumnRenamed`` at a time (``utils.py:55-66``), which builds a
linear chain of projections; ``toDF(*names)`` does it in a single
projection node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions.names import sanitize_identifier


def sanitize_columns(df: DataFrame) -> DataFrame:
    """Rename every column to its Parquet-legal form; collision-safe
    (appends ``_2``, ``_3``, … when two headers sanitize identically)."""
    seen: dict[str, int] = {}
    names: list[str] = []
    for c in df.columns:
        base = sanitize_identifier(c) or "col"
        n = seen.get(base, 0) + 1
        seen[base] = n
        names.append(base if n == 1 else f"{base}_{n}")
    return df.toDF(*names)
