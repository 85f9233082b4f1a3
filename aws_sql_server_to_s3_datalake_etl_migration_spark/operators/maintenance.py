"""Lake-table maintenance: compaction and sort-ordered layout.

The reference rewrites whole tables per run (``utils.py:203-205``) and
never revisits layout. Real lakes accumulate damage the reference never
faced: incremental appends (M1) leave thousands of small files, and
unsorted data defeats parquet min/max row-group skipping. Both are
standing maintenance jobs at 100 TB:

- ``compact``: rewrite a table into ~``target_file_mb`` files. Small
  files are a *read*-side tax (one scheduler task + one footer fetch
  each); compaction pays one write to fix every future scan.
- ``optimize_layout``: range-repartition + sort within partitions on
  the dominant filter columns, so each parquet row group covers a
  narrow value range and selective scans skip most of the table via
  min/max stats (the poor man's Z-order; exact for 1-column
  predicates, good for leading-column predicates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import fs
from ..sources.fs import data_file_count  # noqa: F401  (re-export)
from ..sources.writers import swap_overwrite


def compact(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 512,
) -> int:
    """Rewrite ``path`` into ⌈bytes / target⌉ files; returns the new
    file count. The rewrite goes through ``swap_overwrite`` (staging
    dir + atomic rename) because parquet cannot overwrite a path that
    is being read — and a compaction must never be able to destroy the
    table it is maintaining.

    512 MB default: big enough that scan tasks amortize scheduling,
    small enough that one task's partition fits executor memory with
    room for the decode.
    """
    n_files = max(
        1, round(fs.dir_bytes(spark, path) / (target_file_mb * 1024 * 1024))
    )
    df = spark.read.parquet(path)
    swap_overwrite(df.repartition(n_files), path)
    return data_file_count(spark, path)


def optimize_layout(
    spark: SparkSession,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
) -> None:
    """Rewrite ``path`` range-partitioned + sorted on ``sort_cols`` so
    min/max row-group stats make predicates on those columns skip files.
    ``repartitionByRange`` samples the data to build balanced ranges —
    one extra pass, paid once, saved on every subsequent selective scan.
    """
    df = spark.read.parquet(path)
    parts = n_files or df.rdd.getNumPartitions()
    swap_overwrite(
        df.repartitionByRange(parts, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols),
        path,
    )


def table_stats(spark: SparkSession, path: str) -> DataFrame:
    """One-row layout report: files, bytes, rows — the R2 size metric
    (``reporting_utils.py:31-42``) widened for maintenance decisions."""
    rows = spark.read.parquet(path).count()
    return spark.createDataFrame(
        [(path, data_file_count(spark, path), fs.dir_bytes(spark, path), rows)],
        "path STRING, n_files INT, total_bytes BIGINT, n_rows BIGINT",
    )
