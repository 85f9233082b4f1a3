"""Relational / ETL / data-pipeline operators (SURVEY.md §2)."""

from .incremental import (  # noqa: F401
    full_refresh,
    high_watermark,
    merge_upsert,
    new_rows_above_watermark,
    write_incremental,
)
from .maintenance import (  # noqa: F401
    compact,
    optimize_layout,
    table_stats,
)
from .skew import (  # noqa: F401
    salted_join,
    two_stage_agg,
    with_salt,
    write_bucketed,
)
