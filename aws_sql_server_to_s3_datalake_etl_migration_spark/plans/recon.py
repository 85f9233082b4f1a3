"""Reconciliation report (R1–R5, reference ``reporting_utils.py``).

Per lake table: source row count vs lake row count, bytes on disk, and
last ingestion duration, joined into one queryable ``recon_report``.
Fixes from SURVEY.md §2.11: table discovery looks under the actual lake
prefix, and the three metrics are FULL-outer-joined so a table missing
one metric still appears (the reference's inner joins dropped it).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources import fs
from .metastore import OperationalMetastore


def discover_tables(spark: SparkSession, lake_root: str) -> list[str]:
    """R1: table list = first-level directories under the lake root.
    Hadoop FS listing, so any store the session can read (``file:``,
    ``s3a:``, ...) works — the reference's boto3 prefix listing
    (``reporting_utils.py:20-28``) pinned this to S3."""
    return fs.list_subdirs(spark, lake_root)


def table_sizes(spark: SparkSession, lake_root: str) -> DataFrame:
    """R2: recursive byte size per table directory."""
    rows = []
    for t in discover_tables(spark, lake_root):
        rows.append((t, fs.dir_bytes(spark, f"{lake_root.rstrip('/')}/{t}")))
    schema = StructType(
        [
            StructField("TableName", StringType(), False),
            StructField("TableSize", LongType(), True),
        ]
    )
    return spark.createDataFrame(rows, schema)


def count_reconciliation(
    spark: SparkSession,
    lake_root: str,
    source_reader,
    name_map=None,
) -> DataFrame:
    """R4 (reporting_utils.py:63-74): per table, source count vs lake
    count. ``source_reader(table_name) -> DataFrame | None`` abstracts
    the JDBC source (tests pass a parquet-backed reader). Unreadable
    sources are skipped, as in the reference (:71-72)."""
    rows = []
    for t in discover_tables(spark, lake_root):
        src_name = name_map(t) if name_map else t.replace("_", ".", 1)
        try:
            src = source_reader(t)
            src_count = src.count() if src is not None else None
        except Exception:
            continue  # skip-on-error preserved
        lake_count = spark.read.parquet(
            f"{lake_root.rstrip('/')}/{t}"
        ).count()
        rows.append((t, src_name, src_count, lake_count))
    schema = StructType(
        [
            StructField("TableName", StringType(), False),
            StructField("OnpremTableName", StringType(), True),
            StructField("OnpremRowCounts", LongType(), True),
            StructField("TableRowCounts", LongType(), True),
        ]
    )
    return spark.createDataFrame(rows, schema)


def recon_report(
    spark: SparkSession,
    lake_root: str,
    source_reader,
    metastore: OperationalMetastore | None = None,
    output_path: str | None = None,
) -> DataFrame:
    """R5 (reporting_utils.py:77-89): counts ⋈ durations ⋈ sizes on
    TableName — full-outer so partial metrics survive — optionally
    persisted as the ``recon_report`` lake table."""
    counts = count_reconciliation(spark, lake_root, source_reader)
    sizes = table_sizes(spark, lake_root)
    report = counts.join(sizes, ["TableName"], "full_outer")
    if metastore is not None:
        times = metastore.last_success_durations()
        report = report.join(times, ["TableName"], "full_outer")
    else:
        report = report.withColumn(
            "IngestionTime", F.lit(None).cast("int")
        )
    if output_path:
        report.write.mode("overwrite").parquet(output_path)
    return report


def assert_reconciled(report: DataFrame) -> None:
    """Recon-as-test (SURVEY.md §5): every table's source and lake
    counts must match."""
    bad = report.where(
        F.col("OnpremRowCounts").isNotNull()
        & (F.col("OnpremRowCounts") != F.col("TableRowCounts"))
    ).collect()
    if bad:
        raise AssertionError(f"unreconciled tables: {bad}")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """R6 (extension): row-level change set between two snapshots of a
    keyed table — the CDC you derive when the source can't emit one.
    Returns one row per key present in either snapshot with
    ``change_type`` in (``inserted``, ``deleted``, ``updated``,
    ``unchanged``), ready to feed the MERGE writer or an audit sink.

    One full-outer join on the key — the canonical two-sided shuffle;
    change detection is a null-safe comparison over ``compare_cols``
    (default: all shared non-key columns), so schema drift in either
    snapshot fails analysis loudly rather than mis-classifying.
    """
    shared = [c for c in old.columns if c in set(new.columns)]
    cmp_cols = compare_cols or [c for c in shared if c not in set(keys)]
    o = old.select(*keys, *cmp_cols)
    n = new.select(*keys, *cmp_cols)
    o_alias, n_alias = o.alias("_o"), n.alias("_n")
    cond = [
        F.col(f"_o.{k}").eqNullSafe(F.col(f"_n.{k}")) for k in keys
    ]
    in_old = F.col(f"_o.{keys[0]}").isNotNull()
    in_new = F.col(f"_n.{keys[0]}").isNotNull()
    same = (
        F.lit(True)
        if not cmp_cols
        else reduce(
            lambda a, b: a & b,
            [
                F.col(f"_o.{c}").eqNullSafe(F.col(f"_n.{c}"))
                for c in cmp_cols
            ],
        )
    )
    change = (
        F.when(~in_old, F.lit("inserted"))
        .when(~in_new, F.lit("deleted"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("updated"))
    )
    return o_alias.join(n_alias, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"_n.{k}"), F.col(f"_o.{k}")).alias(k)
            for k in keys
        ],
        change.alias("change_type"),
    )
