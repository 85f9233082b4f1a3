"""Control-plane tests: dependency layering, runners (parallel /
serial-with-SUSPENDED), metastore, recon report."""

from __future__ import annotations

import time

import pytest

from aws_sql_server_to_s3_datalake_etl_migration_spark.plans import (
    JobRunner,
    OperationalMetastore,
    layered_jobs,
    layers_from_edges,
    recon_report,
)
from aws_sql_server_to_s3_datalake_etl_migration_spark.plans.dependencies import (
    batches,
)
from aws_sql_server_to_s3_datalake_etl_migration_spark.plans.recon import (
    assert_reconciled,
)


def test_layers_from_edges_kahn():
    edges = [
        ("b", "a"),
        ("c", "a"),
        ("d", "b"),
        ("d", "c"),
        ("a", None),
        ("e", None),
    ]
    assert layers_from_edges(edges) == [["a", "e"], ["b", "c"], ["d"]]


def test_layers_cycle_detection():
    with pytest.raises(ValueError, match="cycle"):
        layers_from_edges([("a", "b"), ("b", "a")])


def test_layered_jobs_trusted_and_derived(spark):
    rows = [
        ("Orders", "Customer", 1),
        ("Customer", None, 0),
        ("LineItem", "Orders", 2),
    ]
    df = spark.createDataFrame(rows, ["Table", "Parent Table", "Layer"])
    trusted = layered_jobs(df, layer_col="Layer", prefix="nis_")
    assert trusted == [["nis_customer"], ["nis_orders"], ["nis_lineitem"]]
    derived = layered_jobs(df, prefix="nis_")
    assert derived == trusted
    filtered = layered_jobs(
        df,
        known_jobs={"nis_customer", "nis_lineitem"},
        layer_col="Layer",
        prefix="nis_",
    )
    assert filtered == [["nis_customer"], ["nis_lineitem"]]


def test_batches_even_split():
    jobs = [f"j{i}" for i in range(7)]
    got = batches(jobs, max_batch_size=3)
    assert [len(b) for b in got] == [3, 2, 2]
    assert sum(got, []) == jobs
    assert batches([], 3) == []


def test_run_parallel_isolates_failures(spark, tmp_path):
    meta = OperationalMetastore(spark, str(tmp_path / "meta"))
    runner = JobRunner(spark, meta)
    runner.register("ok1", lambda: spark.range(5).count())
    runner.register("boom", lambda: 1 / 0)
    runner.register("ok2", lambda: spark.range(3).count())
    results = runner.run_parallel(["ok1", "boom", "ok2"])
    by_name = {r.job_name: r for r in results}
    assert by_name["ok1"].status == "SUCCEEDED" and by_name["ok1"].value == 5
    assert by_name["boom"].status == "FAILED"
    assert "division" in by_name["boom"].error
    assert by_name["ok2"].status == "SUCCEEDED"
    logged = meta.read().collect()
    assert {r.job_name: r.job_status for r in logged} == {
        "ok1": "SUCCEEDED",
        "boom": "FAILED",
        "ok2": "SUCCEEDED",
    }
    assert all(r.job_duration >= 0 for r in logged)


def test_run_series_suspends_downstream(spark, tmp_path):
    meta = OperationalMetastore(spark, str(tmp_path / "meta2"))
    runner = JobRunner(spark, meta)
    ran = []
    runner.register("a", lambda: ran.append("a"))
    runner.register("fail", lambda: (_ for _ in ()).throw(ValueError("x")))
    runner.register("never", lambda: ran.append("never"))
    with pytest.raises(RuntimeError, match="suspended"):
        runner.run_series(["a", "fail", "never"])
    assert ran == ["a"]
    statuses = {r.job_name: r.job_status for r in meta.read().collect()}
    assert statuses == {
        "a": "SUCCEEDED",
        "fail": "FAILED",
        "never": "SUSPENDED",
    }


def test_runner_retries_flaky_job(spark):
    runner = JobRunner(spark, max_retries=2)
    attempts = {"n": 0}

    def flaky():
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise ValueError("transient")
        return "ok"

    runner.register("flaky", flaky)
    (res,) = runner.run_parallel(["flaky"])
    assert res.status == "SUCCEEDED" and res.value == "ok"
    assert attempts["n"] == 3

    # default stays at the reference's MaxRetries=0
    runner0 = JobRunner(spark)
    attempts["n"] = 0
    runner0.register("flaky", flaky)
    (res0,) = runner0.run_parallel(["flaky"])
    assert res0.status == "FAILED" and attempts["n"] == 1


def test_run_layers_end_to_end(spark):
    runner = JobRunner(spark)
    order = []
    for name in ("c", "o", "l"):
        runner.register(name, lambda n=name: order.append(n))
    results = runner.run_layers([["c"], ["o", "l"]], max_batch_size=2)
    assert [r.status for r in results] == ["SUCCEEDED"] * 3
    assert order[0] == "c" and set(order[1:]) == {"o", "l"}


def test_recon_report_and_assert(spark, tmp_path, sf_dir):
    lake = tmp_path / "lake"
    src = spark.read.parquet(f"{sf_dir}/nation.parquet")
    src.write.parquet(str(lake / "nis_nation"))
    spark.read.parquet(f"{sf_dir}/region.parquet").write.parquet(
        str(lake / "nis_region")
    )

    def source_reader(table):
        return spark.read.parquet(f"{sf_dir}/{table.split('_', 1)[1]}.parquet")

    meta = OperationalMetastore(spark, str(tmp_path / "meta3"))
    from datetime import datetime, timedelta, timezone

    t0 = datetime.now(timezone.utc)
    meta.record("nis_nation", "[]", "SUCCEEDED", t0, t0 + timedelta(seconds=3))
    # lake root addressed by URI: the Hadoop FS port means any scheme
    # the session can read (file:, s3a:, ...) works, not just local paths
    report = recon_report(
        spark,
        f"file://{lake}",
        source_reader,
        metastore=meta,
        output_path=str(tmp_path / "recon_out"),
    )
    rows = {r.TableName: r for r in report.collect()}
    assert rows["nis_nation"].OnpremRowCounts == rows["nis_nation"].TableRowCounts == 25
    assert rows["nis_nation"].OnpremTableName == "nis.nation"
    assert rows["nis_nation"].TableSize > 0
    assert rows["nis_nation"].IngestionTime == 3
    # nis_region has no metastore entry but still appears (outer join fix)
    assert rows["nis_region"].IngestionTime is None
    assert_reconciled(report)
    assert spark.read.parquet(str(tmp_path / "recon_out")).count() == 2


def test_bootstrap_idempotent(spark, tmp_path):
    from aws_sql_server_to_s3_datalake_etl_migration_spark.plans import (
        bootstrap,
        database_exists,
    )

    lake = tmp_path / "lake_root"
    bootstrap(spark, str(lake), databases=("db_a", "db_b"))
    bootstrap(spark, str(lake), databases=("db_a", "db_b"))  # idempotent
    assert lake.is_dir()
    assert database_exists(spark, "db_a")
    assert database_exists(spark, "db_b")
    spark.sql("DROP DATABASE db_a")
    spark.sql("DROP DATABASE db_b")


def test_assert_reconciled_raises(spark):
    bad = spark.createDataFrame(
        [("t", "s.t", 10, 9)],
        "TableName STRING, OnpremTableName STRING, "
        "OnpremRowCounts BIGINT, TableRowCounts BIGINT",
    )
    with pytest.raises(AssertionError, match="unreconciled"):
        assert_reconciled(bad)
