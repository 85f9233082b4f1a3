"""Round-13 fixes: distributed CONVERT footer stats, partition-order
inference, non-Hive path rejection, and the size-gated broadcast
helper."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.hints import (
    maybe_broadcast,
)
from aws_sql_server_to_s3_datalake_etl_migration_spark.sources import (
    delta_log,
)
from aws_sql_server_to_s3_datalake_etl_migration_spark.sources.readers import (
    read_delta,
)


def _log_adds(path: str) -> list[dict]:
    out = []
    with open(
        os.path.join(path, "_delta_log", "0" * 20 + ".json")
    ) as fh:
        for line in fh:
            a = json.loads(line)
            if "add" in a:
                out.append(a["add"])
    return out


def test_convert_stats_collected_executor_side(spark, tmp_path):
    """A many-file (> the 8-file local-path cutoff) two-level
    partitioned table must convert with (a) partitionColumns in
    PHYSICAL nesting order — year before month even though 'month'
    sorts first alphabetically — and (b) footer stats on every add,
    proving the distributed mapInPandas stats path produces the same
    per-file JSON the local path does."""
    df = spark.createDataFrame(
        [
            (y, m, y * 100 + m * 10 + i, float(i))
            for y in (2023, 2024)
            for m in (1, 2, 3)
            for i in range(4)
        ],
        "year int, month int, id long, v double",
    )
    p = str(tmp_path / "tbl")
    # 4 writer tasks x 6 leaf dirs -> well over 8 files
    df.repartition(4, "id").write.partitionBy(
        "year", "month"
    ).parquet(p)
    n_files = sum(
        1
        for root, _, files in os.walk(p)
        for f in files
        if f.endswith(".parquet")
    )
    assert n_files > 8, "fixture must exercise the distributed path"
    assert delta_log.convert_to_delta(spark, p) == 0
    md = delta_log.latest_metadata(spark, p)
    # nesting order, not alphabetical ('month' < 'year')
    assert md["partitionColumns"] == ["year", "month"]
    adds = _log_adds(p)
    assert len(adds) == n_files
    for a in adds:
        assert set(a["partitionValues"]) == {"year", "month"}
        stats = json.loads(a["stats"])
        assert stats["numRecords"] >= 1
        assert "id" in stats["minValues"]
        assert stats["minValues"]["id"] <= stats["maxValues"]["id"]
    # converted table reads back exactly
    got = {r["id"] for r in read_delta(spark, p).collect()}
    assert got == {r["id"] for r in df.collect()}


def test_convert_rejects_non_hive_subdir(spark, tmp_path):
    """A data file under a non-k=v subdirectory is not a Hive layout:
    conversion must raise instead of fabricating a bogus partition
    key with an empty value."""
    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    p = tmp_path / "tbl"
    df.write.parquet(str(p / "sub"))
    # drop markers so only the stray layout remains visible
    with pytest.raises(ValueError, match="non-Hive path segment"):
        delta_log.convert_to_delta(spark, str(p))


def test_maybe_broadcast_size_gate(spark):
    """Under the bound -> ResolvedHint in the analyzed plan; a 1-byte
    bound -> no hint (AQE owns the strategy). size_of substitutes the
    probe frame."""
    small = spark.range(10).withColumnRenamed("id", "k")
    big_est = small.crossJoin(
        spark.range(100).withColumnRenamed("id", "j")
    )

    def n_hints(df):
        return (
            df._jdf.queryExecution().analyzed().toString()
        ).count("ResolvedHint")

    probe = spark.range(1000)
    joined = probe.join(maybe_broadcast(small), probe.id == small.k)
    assert n_hints(joined) == 1
    joined_no = probe.join(
        maybe_broadcast(small, bound_bytes=1), probe.id == small.k
    )
    assert n_hints(joined_no) == 0
    # size_of: the join-product estimate for big_est is huge, but the
    # caller-supplied base frame gates it back in
    assert n_hints(
        probe.join(
            maybe_broadcast(big_est, size_of=small),
            probe.id == big_est.k,
        )
    ) == 1
