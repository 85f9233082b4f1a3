"""Structured Streaming tests: exactly-once file ingest, windowed
watermark aggregation, custom stateful sessionization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_sql_server_to_s3_datalake_etl_migration_spark.streaming import (
    sessionize,
    stream_append_to_lake,
    stream_ingest_files,
    stream_merge_to_lake,
    windowed_event_counts,
)


def test_stream_merge_upserts_per_batch(spark, tmp_path):
    src = tmp_path / "merge_landing"
    src.mkdir()
    lake = str(tmp_path / "merge_lake")
    ckpt = str(tmp_path / "merge_ckpt")
    schema = "pk BIGINT, v STRING"

    def drain():
        q = stream_merge_to_lake(
            stream_ingest_files(spark, str(src / "*"), schema),
            lake,
            ckpt,
            primary_key="pk",
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [(1, "a"), (2, "b")], schema
    ).write.parquet(str(src / "b1"))
    drain()
    # batch 2 updates pk=2 and inserts pk=3
    spark.createDataFrame(
        [(2, "B2"), (3, "c")], schema
    ).write.parquet(str(src / "b2"))
    drain()
    got = {r.pk: r.v for r in spark.read.parquet(lake).collect()}
    assert got == {1: "a", 2: "B2", 3: "c"}


def test_stream_ingest_exactly_once(spark, tmp_path):
    src = tmp_path / "landing"
    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    spark.range(0, 10).withColumn("v", F.col("id") * 2).write.parquet(
        str(src / "batch1"), mode="overwrite"
    )
    schema = "id BIGINT, v BIGINT"
    # drain batch 1
    stream = stream_ingest_files(spark, str(src / "*"), schema)
    q = stream_append_to_lake(stream, lake, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(lake).count() == 10
    # add batch 2; re-drain: only new files are processed (checkpoint)
    spark.range(10, 15).withColumn("v", F.col("id") * 2).write.parquet(
        str(src / "batch2"), mode="overwrite"
    )
    q2 = stream_append_to_lake(
        stream_ingest_files(spark, str(src / "*"), schema), lake, ckpt
    )
    q2.awaitTermination(120)
    out = spark.read.parquet(lake)
    assert out.count() == 15  # no duplicates from batch 1
    assert out.select(F.sum("id")).first()[0] == sum(range(15))


def test_windowed_counts_batch_semantics(spark):
    # windowed agg validated on a batch frame (same expression tree the
    # stream runs); watermark semantics are exercised in the stream test
    rows = [
        ("2024-01-01 00:00:10", "click", 1.0),
        ("2024-01-01 00:00:50", "click", 2.0),
        ("2024-01-01 00:01:10", "view", 3.0),
    ]
    df = spark.createDataFrame(rows, ["ts_s", "event_type", "value"]).select(
        F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value"
    )
    out = windowed_event_counts(df).collect()
    got = {
        (str(r.window_start), r.event_type): (r.n_events, r.sum_value)
        for r in out
    }
    assert got[("2024-01-01 00:00:00", "click")] == (2, 3.0)
    assert got[("2024-01-01 00:01:00", "view")] == (1, 3.0)


def test_sessionize_stateful_stream(spark, tmp_path):
    src = tmp_path / "sessions_in"
    src.mkdir()
    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:00:05"),
        (2, "2024-01-01 00:00:01"),
    ]
    (
        spark.createDataFrame(rows, ["user_id", "ts_s"])
        .select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
        .write.parquet(str(src / "b1"))
    )
    out_dir = str(tmp_path / "sessions_out")
    ckpt = str(tmp_path / "sess_ckpt")

    def drain():
        q = (
            sessionize(
                stream_ingest_files(
                    spark, str(src / "*"), "user_id BIGINT, ts TIMESTAMP"
                ),
                gap_ms=2_000,
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drain()
    # availableNow drains input; sessions close on the processing-time
    # timeout, so state exists but output may be empty — run one more
    # micro-batch after the timeout to flush closed sessions.
    import time

    time.sleep(3)
    (
        spark.createDataFrame([(99, "2024-01-01 01:00:00")], ["user_id", "ts_s"])
        .select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
        .write.parquet(str(src / "b2"))
    )
    drain()
    got = {
        r.user_id: r.n_events for r in spark.read.parquet(out_dir).collect()
    }
    assert got.get(1) == 2
    assert got.get(2) == 1
