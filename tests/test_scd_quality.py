"""Unit tests for SCD2 dimension versioning and data-quality
expectations — the edge semantics the oracle query can't see:
multi-batch history accumulation, closed-row passthrough, null-safe
change detection, and per-rule violation counting.
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.quality import (
    expectation_report,
)
from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.scd import (
    scd2_apply,
    scd2_bootstrap,
)


def _ts(s):
    return F.lit(s).cast("timestamp")


@pytest.fixture()
def dim(spark):
    return spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0), (3, "carol", None)],
        "id bigint, name string, bal double",
    )


def test_scd2_two_batches_accumulate_history(spark, dim):
    hist = scd2_bootstrap(dim, _ts("2020-01-01"))
    # batch 1: change id=1, no-op id=2, insert id=4
    b1 = spark.createDataFrame(
        [(1, "alice", 11.0), (2, "bob", 20.0), (4, "dan", 40.0)],
        "id bigint, name string, bal double",
    )
    h1 = scd2_apply(hist, b1, ["id"], _ts("2020-02-01"))
    rows = {(r.id, r.is_current): r for r in h1.collect()}
    assert len(rows) == 5  # 3 original + 1 closed->reopened + 1 fresh
    closed = rows[(1, False)]
    assert closed.bal == 10.0
    assert str(closed.valid_to).startswith("2020-02-01")
    reopened = rows[(1, True)]
    assert reopened.bal == 11.0 and reopened.valid_to is None
    assert rows[(2, True)].valid_from.year == 2020
    assert str(rows[(2, True)].valid_from).startswith("2020-01-01")
    assert str(rows[(4, True)].valid_from).startswith("2020-02-01")

    # batch 2: change id=1 again -> two closed versions, one open
    b2 = spark.createDataFrame(
        [(1, "alice", 12.0)], "id bigint, name string, bal double"
    )
    h2 = scd2_apply(h1, b2, ["id"], _ts("2020-03-01"))
    v1 = sorted(
        h2.where("id = 1").collect(), key=lambda r: str(r.valid_from)
    )
    assert [r.bal for r in v1] == [10.0, 11.0, 12.0]
    assert [r.is_current for r in v1] == [False, False, True]
    assert [
        str(r.valid_to)[:10] if r.valid_to else None for r in v1
    ] == ["2020-02-01", "2020-03-01", None]
    # everything else untouched
    assert h2.where("id <> 1").count() == h1.where("id <> 1").count()


def test_scd2_null_safe_change_detection(spark, dim):
    hist = scd2_bootstrap(dim, _ts("2020-01-01"))
    # id=3 keeps bal NULL -> no-op; id=2 moves 20.0 -> NULL -> change
    upd = spark.createDataFrame(
        [(3, "carol", None), (2, "bob", None)],
        "id bigint, name string, bal double",
    )
    out = scd2_apply(hist, upd, ["id"], _ts("2021-01-01"))
    assert out.where("id = 3").count() == 1  # NULL == NULL: untouched
    two = out.where("id = 2").collect()
    assert {r.is_current for r in two} == {True, False}
    assert [r.bal for r in two if r.is_current] == [None]


def test_scd2_missing_business_column_raises(spark, dim):
    hist = scd2_bootstrap(dim, _ts("2020-01-01"))
    bad = spark.createDataFrame([(1, "x")], "id bigint, name string")
    with pytest.raises(ValueError, match="missing business columns"):
        scd2_apply(hist, bad, ["id"], _ts("2020-02-01"))


def test_expectation_report_counts_violations(spark):
    child = spark.createDataFrame(
        [(1, 10), (1, 20), (2, None), (None, 5), (3, -1)],
        "k bigint, v bigint",
    )
    parent = spark.createDataFrame([(1,), (2,)], "pk bigint")
    rep = expectation_report(
        child,
        row_rules={
            "k_not_null": F.col("k").isNull(),
            "v_positive": F.col("v").isNull() | ~(F.col("v") > 0),
        },
        unique_rules={"k_unique": ["k"]},
        ref_rules={"k_in_parent": (["k"], parent, ["pk"])},
    )
    got = {r.rule: (r.violations, r.passed) for r in rep.collect()}
    assert got["k_not_null"] == (1, False)
    assert got["v_positive"] == (2, False)  # NULL v and -1
    # 5 rows, distinct non-null k = {1,2,3} -> countDistinct=3 -> 2 dups
    assert got["k_unique"] == (2, False)
    # anti-join: k=None and k=3 have no parent -> 2 violations
    assert got["k_in_parent"] == (2, False)


def test_expectation_report_all_pass(spark):
    df = spark.createDataFrame([(1,), (2,)], "k bigint")
    rep = expectation_report(
        df, row_rules={"k_not_null": F.col("k").isNull()}
    )
    r = rep.collect()[0]
    assert (r.violations, bool(r.passed)) == (0, True)


def test_expectation_report_requires_rules(spark):
    df = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(ValueError):
        expectation_report(df)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    batches=st.lists(
        st.dictionaries(
            st.integers(1, 6), st.integers(0, 3), min_size=1, max_size=4
        ),
        min_size=1,
        max_size=3,
    )
)
def test_scd2_invariants_random_batches(spark, batches):
    """Against a Python reference model, any batch sequence must keep
    the SCD2 invariants: current rows mirror the latest values, version
    count per key = 1 + effective changes, and valid_to is set exactly
    on non-current rows."""
    hist = scd2_bootstrap(
        spark.createDataFrame(
            [(k, 0) for k in range(1, 5)], "id bigint, v bigint"
        ),
        _ts("2020-01-01"),
    )
    expected = {k: 0 for k in range(1, 5)}
    versions = dict.fromkeys(expected, 1)
    for i, b in enumerate(batches):
        upd = spark.createDataFrame(
            [(k, v) for k, v in b.items()], "id bigint, v bigint"
        )
        hist = scd2_apply(hist, upd, ["id"], _ts(f"2020-02-{i + 1:02d}"))
        for k, v in b.items():
            if k not in expected or expected[k] != v:
                versions[k] = versions.get(k, 0) + 1
                expected[k] = v
    rows = hist.collect()
    assert {r.id: r.v for r in rows if r.is_current} == expected
    counts = Counter(r.id for r in rows)
    assert dict(counts) == versions
    for r in rows:
        assert (r.valid_to is None) == bool(r.is_current)


def test_snapshot_diff_null_safety(spark):
    """Null compare values must not mis-classify: null == null is
    'unchanged' (eqNullSafe), null -> value is 'updated'."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark.plans.recon import snapshot_diff

    old = spark.createDataFrame(
        [(1, None), (2, "b"), (3, "c"), (4, None)],
        "k INT, v STRING",
    )
    new = spark.createDataFrame(
        [(1, None), (2, "B"), (4, "now-set"), (5, "e")],
        "k INT, v STRING",
    )
    got = {
        r.k: r.change_type
        for r in snapshot_diff(old, new, keys=["k"]).collect()
    }
    assert got == {
        1: "unchanged",   # null == null
        2: "updated",
        3: "deleted",
        4: "updated",     # null -> value
        5: "inserted",
    }


def test_observed_write_collects_metrics_in_flight(spark, tmp_path):
    """df.observe: quality metrics ride the write action itself — the
    reported numbers describe exactly the written rows, with no second
    scan of the source."""
    from pyspark.sql import functions as F

    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.quality import (
        observed_write,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, -3.0), (3, 5.5), (4, None)],
        "id bigint, v double",
    )
    out = str(tmp_path / "observed")
    got = observed_write(
        df,
        writer_fn=lambda d: d.write.mode("overwrite").parquet(out),
        metrics={
            "n_rows": F.count(F.lit(1)),
            "v_total": F.sum("v"),
        },
        row_rules={
            "v_nonnegative": F.col("v") < 0,
            "v_present": F.col("v").isNull(),
        },
    )
    assert got["n_rows"] == 4
    assert got["v_total"] == pytest.approx(12.5)
    assert got["v_nonnegative_violations"] == 1
    assert got["v_present_violations"] == 1
    assert spark.read.parquet(out).count() == 4

    with pytest.raises(ValueError, match="at least one"):
        observed_write(df, writer_fn=lambda d: None)


def test_scd2_change_feed_insert_update_delete(spark):
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.scd import (
        scd2_change_feed,
    )

    hist = spark.createDataFrame(
        [
            # key 1: two versions, still current -> insert + update
            (1, "a", "2020-01-01 00:00:00", "2021-01-01 00:00:00", False),
            (1, "b", "2021-01-01 00:00:00", None, True),
            # key 2: single closed version, no successor -> insert + delete
            (2, "x", "2020-06-01 00:00:00", "2020-07-01 00:00:00", False),
            # key 3: single open version -> insert only
            (3, "y", "2020-02-01 00:00:00", None, True),
        ],
        "k long, v string, valid_from string, valid_to string, is_current boolean",
    ).select(
        "k", "v",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
        "is_current",
    )
    out = scd2_change_feed(hist, keys=["k"]).collect()
    ops = sorted((r.k, r.op, str(r.change_ts)) for r in out)
    assert ops == [
        (1, "insert", "2020-01-01 00:00:00"),
        (1, "update", "2021-01-01 00:00:00"),
        (2, "delete", "2020-07-01 00:00:00"),
        (2, "insert", "2020-06-01 00:00:00"),
        (3, "insert", "2020-02-01 00:00:00"),
    ]
    assert {r.v for r in out if r.op == "delete"} == {"x"}


def test_funnel_windowed_never_exceeds_unbounded(spark, sf_dir):
    import aws_sql_server_to_s3_datalake_etl_migration_spark.workloads as wl

    qs = wl.queries()
    un = qs["event_funnel_conversion"](spark, sf_dir).first()
    wi = qs["event_funnel_windowed"](spark, sf_dir).first()
    assert wi.n_view == un.n_view  # stage 1 has no deadline
    assert wi.n_view_click_1h <= un.n_view_click
    assert wi.n_full_funnel_1h <= un.n_view_click_purchase


# ---------------------------------------------------------------------------
# Write-Audit-Publish (round 9)
# ---------------------------------------------------------------------------


def test_wap_publishes_only_green_batches(spark, tmp_path):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.wap import (
        WapRejected,
        wap_run,
    )
    from aws_sql_server_to_s3_datalake_etl_migration_spark.sources.readers import (
        read_delta,
    )

    target = str(tmp_path / "target")
    staging = str(tmp_path / "staging")
    good = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "pk long, v double"
    )
    out = wap_run(
        spark,
        good,
        target,
        staging,
        wap_id="b1",
        row_rules={"v_positive": F.col("v") <= 0},
        unique_rules={"pk_unique": ["pk"]},
    )
    assert out["published_version"] == 0
    assert {r["pk"] for r in read_delta(spark, target).collect()} == {1, 2}

    # a red batch: duplicate pk AND a negative value — target untouched
    bad = spark.createDataFrame(
        [(3, -1.0), (3, 5.0)], "pk long, v double"
    )
    with _pytest.raises(WapRejected) as ei:
        wap_run(
            spark,
            bad,
            target,
            staging,
            wap_id="b2",
            row_rules={"v_positive": F.col("v") <= 0},
            unique_rules={"pk_unique": ["pk"]},
        )
    assert {f["rule"] for f in ei.value.failures} == {
        "v_positive", "pk_unique",
    }
    assert {r["pk"] for r in read_delta(spark, target).collect()} == {1, 2}
    # the rejected batch stays inspectable in staging with its report
    import json as _json
    import os as _os

    staged = read_delta(spark, ei.value.staging_path)
    assert staged.count() == 2
    rep = _json.load(
        open(_os.path.join(ei.value.staging_path, "_audit.json"))
    )
    assert any(not r["passed"] for r in rep["report"])


def test_wap_publish_is_idempotent_per_wap_id(spark, tmp_path):
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.wap import (
        wap_run,
    )
    from aws_sql_server_to_s3_datalake_etl_migration_spark.sources.readers import (
        read_delta,
    )

    target = str(tmp_path / "t2")
    staging = str(tmp_path / "s2")
    batch = spark.createDataFrame([(1, "a")], "pk long, v string")
    out1 = wap_run(spark, batch, target, staging, wap_id="same")
    # the crashed-after-publish retry: same wap id, same batch
    out2 = wap_run(spark, batch, target, staging, wap_id="same")
    assert out1["published_version"] == 0
    assert out2["published_version"] is None  # replay skipped
    assert read_delta(spark, target).count() == 1


def test_wap_retry_after_stage_crash_does_not_double_publish(
    spark, tmp_path
):
    """ADVICE r9 (medium): a cycle that crashed AFTER the staging
    commit but BEFORE publish must not, on retry, append a second
    copy of the batch into the same staging table and publish the
    doubled snapshot — the retry reuses the already-committed staged
    copy."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.wap import (
        wap_run,
    )
    from aws_sql_server_to_s3_datalake_etl_migration_spark.sources import (
        delta_log,
    )
    from aws_sql_server_to_s3_datalake_etl_migration_spark.sources.readers import (
        read_delta,
    )

    target = str(tmp_path / "t3")
    staging = str(tmp_path / "s3")
    batch = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "pk long, v double"
    )
    # simulate the crashed first attempt: the batch landed in staging
    # (atomic commit succeeded) but the cycle died before publish
    delta_log.append_commit(batch, f"{staging}/wap-crashed")
    # the retry of the SAME cycle (same wap id -> same staging path)
    out = wap_run(spark, batch, target, staging, wap_id="crashed")
    assert out["published_version"] == 0
    staged = read_delta(spark, out["staging_path"])
    assert staged.count() == 2  # NOT 4 — the retry did not re-append
    assert read_delta(spark, target).count() == 2
