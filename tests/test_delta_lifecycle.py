"""Round-8 Delta fallback-log lifecycle tests: spec-complete
checkpoints, partitioned tables, log-depth bounds, and healing of
pre-round-8 path-only checkpoints.

Reference parity: the reference's Delta usage is delta-spark append +
MERGE (``utils.py:76-80, 222-230``); everything here is the fallback
engine's own protocol surface (sources/delta_log.py), built from the
public delta.io PROTOCOL.md.
"""

from __future__ import annotations

import json
import os
import re

import pytest
from pyspark.sql import functions as F

from aws_sql_server_to_s3_datalake_etl_migration_spark.sources import (
    delta_log,
)
from aws_sql_server_to_s3_datalake_etl_migration_spark.sources.readers import (
    _delta_live_adds,
    read_delta,
)
from aws_sql_server_to_s3_datalake_etl_migration_spark.sources.writers import (
    write_delta_append,
)


def _log_jsons(path: str) -> list[str]:
    return sorted(
        n
        for n in os.listdir(os.path.join(path, "_delta_log"))
        if re.fullmatch(r"\d{20}\.json", n)
    )


def test_checkpoint_is_spec_complete(spark, tmp_path):
    """The checkpoint parquet carries the latest protocol and metaData
    actions plus FULL-FIELD add rows, and _last_checkpoint points at
    it — the shape a real delta-spark reader reconstructs snapshots
    from (r7 verdict item 2)."""
    path = str(tmp_path / "cp_spec")
    write_delta_append(
        spark.createDataFrame([(1, "a"), (2, "b")], "pk long, v string"),
        path,
    )
    write_delta_append(
        spark.createDataFrame([(3, "c")], "pk long, v string"), path
    )
    v = delta_log.write_checkpoint(spark, path)
    assert v == 1
    cp = spark.read.parquet(
        os.path.join(path, "_delta_log", f"{v:020d}.checkpoint.parquet")
    )
    assert {"protocol", "metaData", "add"} <= set(cp.columns)
    proto = cp.where(F.col("protocol").isNotNull()).collect()
    assert len(proto) == 1
    assert proto[0]["protocol"]["minReaderVersion"] == 1
    md = cp.where(F.col("metaData").isNotNull()).collect()
    assert len(md) == 1
    schema_str = md[0]["metaData"]["schemaString"]
    assert json.loads(schema_str)["type"] == "struct"
    adds = cp.where(F.col("add").isNotNull()).select("add.*").collect()
    assert adds and all(
        r["size"] > 0 and r["modificationTime"] > 0 and r["dataChange"]
        for r in adds
    )
    with open(os.path.join(path, "_delta_log", "_last_checkpoint")) as f:
        last = json.load(f)
    assert last["version"] == v
    assert last["size"] == len(adds) + 1  # + the protocol/metaData row


def test_schema_enforcement_survives_truncation(spark, tmp_path):
    """After checkpoint + truncate_log delete every metaData-carrying
    JSON commit, the checkpoint's metaData row keeps schema
    enforcement (and table_schema_json) alive — the silent-disable
    the r7 advice flagged."""
    path = str(tmp_path / "cp_schema")
    write_delta_append(
        spark.createDataFrame([(1, "a")], "pk long, v string"), path
    )
    delta_log.write_checkpoint(spark, path)
    assert delta_log.truncate_log(spark, path) == 1
    assert _log_jsons(path) == []  # no commits left at all
    got = delta_log.table_schema_json(spark, path)
    assert got is not None and '"pk"' in got
    bad = spark.createDataFrame([(2, "b", 9)], "pk long, v string, x int")
    with pytest.raises(ValueError, match="schema mismatch"):
        delta_log.append_commit(bad, path)
    write_delta_append(
        spark.createDataFrame([(2, "b")], "pk long, v string"), path
    )
    assert {(r.pk, r.v) for r in read_delta(spark, path).collect()} == {
        (1, "a"),
        (2, "b"),
    }


def test_partitioned_append_merge_prune_roundtrip(spark, tmp_path):
    """Partitioned fallback-Delta table end to end (r7 verdict item
    4): Hive-layout files, partitionValues in the add actions,
    FILE-LIST partition pruning on read, overwrite + vacuum keep the
    layout."""
    path = str(tmp_path / "part_tbl")
    df = spark.createDataFrame(
        [(i, f"r{i}", ["x", "y", "z"][i % 3]) for i in range(30)],
        "pk long, v string, region string",
    )
    write_delta_append(df, path, partition_by=["region"])
    md = delta_log.latest_metadata(spark, path)
    assert md["partitionColumns"] == ["region"]
    adds = _delta_live_adds(spark, path)
    assert all(a["path"].startswith("region=") for a in adds.values())
    assert {a["partitionValues"]["region"] for a in adds.values()} == {
        "x",
        "y",
        "z",
    }
    # pruning happens at the file list, before any data file opens
    pruned = _delta_live_adds(
        spark, path, partition_filter={"region": "y"}
    )
    assert 0 < len(pruned) < len(adds)
    got = read_delta(spark, path, partition_filter={"region": "y"})
    assert set(got.columns) == {"pk", "v", "region"}  # basePath recovers
    assert {r.pk for r in got.collect()} == {
        i for i in range(30) if i % 3 == 1
    }
    # pruned-to-nothing is an empty frame, not an error
    assert (
        read_delta(
            spark, path, partition_filter={"region": "nope"}
        ).count()
        == 0
    )
    # partition layout is fixed: mismatched appends are rejected
    with pytest.raises(ValueError, match="partitioning mismatch"):
        delta_log.append_commit(df, path)  # unpartitioned append
    # copy-on-write overwrite keeps partitioning; old files vacuum away
    delta_log.overwrite_commit(
        df.where(F.col("pk") < 10), path, partition_by=["region"]
    )
    assert read_delta(spark, path).count() == 10
    dead = delta_log.vacuum(spark, path, min_age_seconds=0)
    assert dead and all(d.startswith("region=") for d in dead)
    assert read_delta(spark, path).count() == 10
    # checkpoint a partitioned table: add rows carry partitionValues
    v = delta_log.write_checkpoint(spark, path)
    cp = spark.read.parquet(
        os.path.join(path, "_delta_log", f"{v:020d}.checkpoint.parquet")
    )
    cp_adds = cp.where(F.col("add").isNotNull()).select("add.*").collect()
    assert all(r["partitionValues"]["region"] for r in cp_adds)
    delta_log.truncate_log(spark, path)
    assert read_delta(
        spark, path, partition_filter={"region": "x"}
    ).count() == sum(1 for i in range(10) if i % 3 == 0)


def test_lifecycle_depth_replay_stays_bounded(spark, tmp_path):
    """~40 commits with a checkpoint+truncate every 10 (r7 verdict
    item 6): the JSON tail a reader must replay never exceeds the
    checkpoint cadence, HEAD stays correct throughout, and time
    travel works back to the newest checkpoint."""
    path = str(tmp_path / "deep")
    cadence = 10
    expected: set[int] = set()
    for i in range(40):
        write_delta_append(
            spark.createDataFrame([(i,)], "pk long"), path
        )
        expected.add(i)
        if (i + 1) % cadence == 0:
            v = delta_log.write_checkpoint(spark, path)
            assert v == i  # version == commit count - 1
            delta_log.truncate_log(spark, path)
        # replay depth is bounded by the cadence, not by history
        assert len(_log_jsons(path)) <= cadence
    assert delta_log.log_version(spark, path) == 39
    assert {r.pk for r in read_delta(spark, path).collect()} == expected
    # time travel lands exactly on a retained checkpoint version...
    assert read_delta(spark, path, version=29).count() == 30
    # ...but a version whose commits were truncated is REFUSED, not
    # silently answered with older state
    with pytest.raises(ValueError, match="no longer reachable"):
        read_delta(spark, path, version=35)
    with open(os.path.join(path, "_delta_log", "_last_checkpoint")) as f:
        assert json.load(f)["version"] == 39


def test_old_path_only_checkpoint_heals(spark, tmp_path):
    """A pre-round-8 table (path-only checkpoint, metaData commits
    truncated) is refused by truncate_log but HEALED by the next
    write_checkpoint, which reconstructs metaData from the live
    parquet footers."""
    path = str(tmp_path / "old_fmt")
    write_delta_append(
        spark.createDataFrame([(1, "a"), (2, "b")], "pk long, v string"),
        path,
    )
    v = delta_log.write_checkpoint(spark, path)
    log_dir = os.path.join(path, "_delta_log")
    cp_file = os.path.join(log_dir, f"{v:020d}.checkpoint.parquet")
    # rewrite the checkpoint in the OLD format: add.path structs only
    old = (
        spark.read.parquet(cp_file)
        .where(F.col("add").isNotNull())
        .select(F.struct(F.col("add.path").alias("path")).alias("add"))
    )
    old_local = str(tmp_path / "old_cp_stage")
    old.coalesce(1).write.mode("overwrite").parquet(old_local)
    os.remove(cp_file)
    part = next(
        n for n in os.listdir(old_local) if n.endswith(".parquet")
    )
    os.rename(os.path.join(old_local, part), cp_file)
    os.remove(os.path.join(log_dir, "_last_checkpoint"))
    for n in _log_jsons(path):
        os.remove(os.path.join(log_dir, n))  # simulate old truncation
    # the surgery bypassed the Hadoop local FS: its .crc sidecars and
    # Spark's cached file statuses still describe the ORIGINAL bytes
    for n in os.listdir(log_dir):
        if n.endswith(".crc"):
            os.remove(os.path.join(log_dir, n))
    spark.catalog.refreshByPath(cp_file)
    # guard: truncating on a metaData-less checkpoint is refused
    write_delta_append(
        spark.createDataFrame([(3, "c")], "pk long, v string"), path
    )
    with pytest.raises(ValueError, match="no metaData"):
        delta_log.truncate_log(spark, path)
    # healing: the next checkpoint reconstructs metaData from footers
    v2 = delta_log.write_checkpoint(spark, path)
    cp2 = spark.read.parquet(
        os.path.join(log_dir, f"{v2:020d}.checkpoint.parquet")
    )
    md = cp2.where(F.col("metaData").isNotNull()).collect()
    assert len(md) == 1 and '"pk"' in md[0]["metaData"]["schemaString"]
    delta_log.truncate_log(spark, path)
    assert {(r.pk, r.v) for r in read_delta(spark, path).collect()} == {
        (1, "a"),
        (2, "b"),
        (3, "c"),
    }
    # schema enforcement is back after healing
    with pytest.raises(ValueError, match="schema mismatch"):
        delta_log.append_commit(
            spark.createDataFrame([(9,)], "pk long"), path
        )
