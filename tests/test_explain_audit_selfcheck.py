"""Self-test for the plan auditor (tools/explain_audit.py): the gate
that keeps scale-hostile plans out must itself flag the regressions it
claims to catch — a silently toothless auditor is worse than none."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from aws_sql_server_to_s3_datalake_etl_migration_spark.registry import (  # noqa: E402
    _REGISTRY,
)

import explain_audit  # noqa: E402


@pytest.fixture()
def scratch_query():
    """Register a throwaway catalog query for the duration of a test."""
    registered: list[str] = []

    def add(name, fn):
        _REGISTRY[name] = (fn, None)
        registered.append(name)
        return name

    yield add
    for n in registered:
        _REGISTRY.pop(n, None)
        explain_audit.EXPECT.pop(n, None)


def test_audit_flags_rehinted_fact_side(spark, scratch_query, sf_dir):
    """A broadcast hint sneaking onto a fact-derived join side (the
    OOM-at-1000x regression) must trip the pinned hint count."""

    def q(spark, d):
        li = spark.read.parquet(f"{d}/lineitem.parquet")
        orders = spark.read.parquet(f"{d}/orders.parquet")
        return li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)

    name = scratch_query("_audit_selfcheck_rehint", q)
    explain_audit.EXPECT[name] = {"hints": 0}
    problems = explain_audit.audit(name)
    assert any("broadcast hints" in p for p in problems)
    # and the same plan passes when the hint is the declared posture
    explain_audit.EXPECT[name] = {"hints": 1}
    assert explain_audit.audit(name) == []


def test_audit_flags_row_at_a_time_python_udf(spark, scratch_query, sf_dir):
    """BatchEvalPython (row-at-a-time Python UDF) is never sanctioned;
    the global check must fire with no per-query expectation at all."""
    from pyspark.sql.types import LongType

    def q(spark, d):
        double_it = F.udf(lambda x: x * 2, LongType())
        return (
            spark.read.parquet(f"{d}/orders.parquet")
            .select(double_it(F.col("o_orderkey")).alias("x"))
        )

    name = scratch_query("_audit_selfcheck_pyudf", q)
    problems = explain_audit.audit(name)
    assert any("BatchEvalPython" in p for p in problems)


def test_audit_flags_accidental_cross_join(spark, scratch_query, sf_dir):
    """A non-equi join collapsing to BroadcastNestedLoopJoin outside
    the scalar-subquery allowlist must be reported."""

    def q(spark, d):
        n = spark.read.parquet(f"{d}/nation.parquet")
        r = spark.read.parquet(f"{d}/region.parquet")
        return n.join(r, n.n_regionkey > r.r_regionkey)

    name = scratch_query("_audit_selfcheck_bnlj", q)
    problems = explain_audit.audit(name)
    assert any("BroadcastNestedLoopJoin" in p for p in problems)


def test_audit_flags_unpartitioned_window(spark, scratch_query, sf_dir):
    """A global ORDER BY window over raw rows (the round-8 scale-killer
    shape) must trip the default-on unpartitioned-window check, and the
    same query must pass once allowlisted with a bound."""
    from pyspark.sql.window import Window

    def q(spark, d):
        o = spark.read.parquet(f"{d}/orders.parquet")
        return o.withColumn(
            "rk",
            F.percent_rank().over(
                Window.orderBy("o_totalprice", "o_orderkey")
            ),
        )

    name = scratch_query("_audit_selfcheck_global_window", q)
    explain_audit.EXPECT[name] = {}
    problems = explain_audit.audit(name)
    assert any("unpartitioned WindowExec" in p for p in problems)
    explain_audit.GLOBAL_WINDOW_OK[name] = "test-only bound"
    try:
        assert explain_audit.audit(name) == []
    finally:
        explain_audit.GLOBAL_WINDOW_OK.pop(name, None)


def test_audit_accepts_partitioned_and_unordered_windows(
    spark, scratch_query, sf_dir
):
    """Neither a partitioned rank window nor a partitioned-no-order
    aggregate window (min-over-group) may false-positive the
    unpartitioned-window check."""
    from pyspark.sql.window import Window

    def q(spark, d):
        o = spark.read.parquet(f"{d}/orders.parquet")
        return o.select(
            "o_orderkey",
            F.row_number()
            .over(
                Window.partitionBy("o_orderstatus").orderBy(
                    "o_totalprice", "o_orderkey"
                )
            )
            .alias("rn"),
            F.min("o_totalprice")
            .over(Window.partitionBy("o_orderstatus"))
            .alias("mn"),
        )

    name = scratch_query("_audit_selfcheck_part_window", q)
    explain_audit.EXPECT[name] = {}
    assert explain_audit.audit(name) == []
