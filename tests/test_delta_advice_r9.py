"""Round-9 regression tests for the concurrency/consistency findings
the round-8 advisor flagged (ADVICE.md): the MERGE snapshot/pin
TOCTOU, the unpinned mergeSchema metaData commit, fsck vs multi-part
checkpoints, the pruned-to-empty logical schema, and overwrite
partitioning-only changes.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from aws_sql_server_to_s3_datalake_etl_migration_spark.operators import (
    incremental,
)
from aws_sql_server_to_s3_datalake_etl_migration_spark.sources import (
    delta_log,
)
from aws_sql_server_to_s3_datalake_etl_migration_spark.sources.readers import (
    read_delta,
)


def _mk(spark, path, rows, ddl="pk long, v string", partition_by=None):
    delta_log.append_commit(
        spark.createDataFrame(rows, ddl), path, partition_by=partition_by
    )


def test_overwrite_commit_pins_the_version_actually_read(spark, tmp_path):
    """read_version pins BOTH the tombstone set and expected_version:
    overwriting against a stale snapshot raises CommitConflict instead
    of silently tombstoning the commit that landed in between."""
    path = str(tmp_path / "pin")
    _mk(spark, path, [(1, "a")])  # v0
    stale_v = delta_log.log_version(spark, path)
    snapshot = read_delta(spark, path, version=stale_v)
    # a concurrent writer lands v1 AFTER our snapshot
    _mk(spark, path, [(2, "b")])
    merged = snapshot.unionByName(
        spark.createDataFrame([(3, "c")], "pk long, v string")
    )
    with pytest.raises(delta_log.CommitConflict):
        delta_log.overwrite_commit(merged, path, read_version=stale_v)
    # the racer's row survived untouched
    assert {r["pk"] for r in read_delta(spark, path).collect()} == {1, 2}


def test_merge_upsert_replays_racer_rows_not_tombstones_them(
    spark, tmp_path, monkeypatch
):
    """A commit landing between the merge's snapshot read and its
    overwrite must end up in the merge RESULT (via conflict + retry),
    never silently tombstoned (the round-8 TOCTOU)."""
    path = str(tmp_path / "merge_race")
    _mk(spark, path, [(1, "a"), (2, "b")])
    racer = spark.createDataFrame([(99, "racer")], "pk long, v string")
    real_overwrite = delta_log.overwrite_commit
    fired = {"done": False}

    def inject_then_overwrite(df, table_path, **kw):
        if not fired["done"]:
            fired["done"] = True
            # a writer lands AFTER merge_upsert read its snapshot
            # (the snapshot version is already pinned in kw)
            delta_log.append_commit(racer, table_path)
        return real_overwrite(df, table_path, **kw)

    monkeypatch.setattr(
        delta_log, "overwrite_commit", inject_then_overwrite
    )
    incoming = spark.createDataFrame(
        [(2, "b2"), (3, "c")], "pk long, v string"
    )
    incremental.merge_upsert(spark, incoming, path, "pk")
    got = {
        r["pk"]: r["v"] for r in read_delta(spark, path).collect()
    }
    # the racer's row is IN the final state alongside the merge
    assert got == {1: "a", 2: "b2", 3: "c", 99: "racer"}


def test_merge_schema_append_preserves_concurrent_constraint(
    spark, tmp_path, monkeypatch
):
    """A widened metaData commit must be pinned: when an ADD CONSTRAINT
    lands between the widening's snapshot read and its commit, the
    append retries and the final metadata carries BOTH the constraint
    and the new column (unpinned, the stale widened metaData silently
    reverted the constraint)."""
    path = str(tmp_path / "widen_race")
    _mk(spark, path, [(1, "a")])
    real_stage = delta_log.stage_data_files
    fired = {"done": False}

    def stage_with_race(df, table_path, **kw):
        adds = real_stage(df, table_path, **kw)
        if not fired["done"]:
            fired["done"] = True
            delta_log.add_check_constraint(
                spark, path, "pk_positive", "pk > 0"
            )
        return adds

    monkeypatch.setattr(delta_log, "stage_data_files", stage_with_race)
    delta_log.append_commit(
        spark.createDataFrame(
            [(2, "b", 7.5)], "pk long, v string, score double"
        ),
        path,
        merge_schema=True,
    )
    md = delta_log.latest_metadata(spark, path)
    fields = [
        f["name"] for f in json.loads(md["schemaString"])["fields"]
    ]
    assert fields == ["pk", "v", "score"]
    assert delta_log.table_constraints(md) == {"pk_positive": "pk > 0"}
    got = {r["pk"] for r in read_delta(spark, path).collect()}
    assert got == {1, 2}


def test_fsck_accepts_multi_part_checkpoint(spark, tmp_path):
    """fsck must resolve N.checkpoint.i.n.parquet via the pointer's
    parts field — a healthy multi-part checkpoint is not 'missing'."""
    path = str(tmp_path / "fsck_parts")
    _mk(spark, path, [(i, f"v{i}") for i in range(20)])
    _mk(spark, path, [(100, "x")])
    delta_log.write_checkpoint(spark, path, parts=3)
    log_dir = os.path.join(path, "_delta_log")
    pointer = json.loads(
        open(os.path.join(log_dir, "_last_checkpoint")).read()
    )
    assert pointer.get("parts", 1) > 1  # precondition: truly multi-part
    report = delta_log.fsck(spark, path)
    assert report["checkpoint_ok"], report["errors"]
    assert report["ok"], report["errors"]
    # and a genuinely missing part IS flagged
    part_files = sorted(
        n for n in os.listdir(log_dir)
        if ".checkpoint." in n and n.endswith(".parquet")
    )
    os.remove(os.path.join(log_dir, part_files[0]))
    report2 = delta_log.fsck(spark, path)
    assert not report2["checkpoint_ok"]


def test_pruned_to_empty_keeps_logical_schema(spark, tmp_path):
    """A stats/partition filter that prunes EVERY file must return the
    same logical shape as a matching read on a column-mapped table —
    not the physical field names."""
    path = str(tmp_path / "empty_mapped")
    _mk(spark, path, [(1, "a"), (2, "b")])
    delta_log.enable_column_mapping(spark, path)
    delta_log.rename_column(spark, path, "v", "label")
    full = read_delta(spark, path)
    assert full.columns == ["pk", "label"]
    empty = read_delta(
        spark, path, stats_filter=[("pk", ">", 10_000)]
    )
    assert empty.count() == 0
    assert empty.columns == full.columns


def test_overwrite_schema_partitioning_only_change_updates_metadata(
    spark, tmp_path
):
    """overwrite_schema with an identical schema but different
    partition_by must commit new metaData (partitionColumns), keeping
    pruning consistent with the staged Hive layout."""
    path = str(tmp_path / "repart")
    _mk(spark, path, [(1, "a"), (2, "b")])
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "pk long, v string"
    )
    delta_log.overwrite_commit(
        df, path, partition_by=["v"], overwrite_schema=True
    )
    md = delta_log.latest_metadata(spark, path)
    assert md["partitionColumns"] == ["v"]
    # partition pruning over the new layout actually prunes
    got = read_delta(spark, path, partition_filter={"v": "b"})
    assert [r["pk"] for r in got.collect()] == [2]
