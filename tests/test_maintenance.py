"""Lake maintenance: compaction reduces file count without changing
data; sorted layout produces row-group stats that let selective scans
skip files."""

from __future__ import annotations

import pyarrow.parquet as pq
import glob

from pyspark.sql import functions as F

from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.maintenance import (
    compact,
    data_file_count,
    optimize_layout,
    table_stats,
)


def test_compact_merges_small_files(spark, tmp_path):
    path = str(tmp_path / "fragmented")
    # simulate many tiny incremental appends
    for i in range(10):
        spark.range(i * 100, (i + 1) * 100).withColumn(
            "v", F.col("id") * 3
        ).write.mode("append").parquet(path)
    assert data_file_count(path) >= 10
    before = spark.read.parquet(path)
    before_sum = before.agg(F.sum("v")).first()[0]
    n_after = compact(spark, path, target_file_mb=512)
    assert n_after < 10
    after = spark.read.parquet(path)
    assert after.count() == 1000
    assert after.agg(F.sum("v")).first()[0] == before_sum


def test_optimize_layout_narrows_rowgroup_ranges(spark, tmp_path, sf_dir):
    path = str(tmp_path / "orders_sorted")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders.count()
    orders.write.parquet(path)
    optimize_layout(spark, path, ["o_orderdate"], n_files=4)
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert len(files) == 4
    # each file covers a disjoint-ish narrow date range -> min/max stats
    # let a selective date predicate skip the other files
    spans = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i
            for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "o_orderdate"
        )
        stats = md.row_group(0).column(col_idx).statistics
        spans.append((stats.min, stats.max))
    spans.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2 or (lo2 - hi1).total_seconds() > -86400
    # data preserved
    assert spark.read.parquet(path).count() == n


def test_table_stats_report(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.range(100).write.parquet(path)
    row = table_stats(spark, path).first()
    assert row.n_rows == 100
    assert row.n_files >= 1
    assert row.total_bytes > 0
