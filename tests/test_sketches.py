"""Sketch aggregates are rows-only in the oracle gate (estimates are
engine-specific); accuracy against exact answers is pinned here."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_sql_server_to_s3_datalake_etl_migration_spark import workloads

from conftest import SF_SMOKE


def test_approx_distinct_within_tolerance(spark):
    got = {
        r.event_type: r.approx_users
        for r in workloads.queries()["approx_distinct_users"](
            spark, SF_SMOKE
        ).collect()
    }
    exact = {
        r.event_type: r.exact
        for r in workloads._events(spark, SF_SMOKE)
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) <= max(3, 0.05 * exact[k]), (
            k,
            est,
            exact[k],
        )


def test_percentiles_bracket_exact_values(spark):
    rows = workloads.queries()["order_value_percentiles"](
        spark, SF_SMOKE
    ).collect()
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    for r in rows:
        vals = sorted(
            x.o_totalprice
            for x in orders.where(
                F.col("o_orderpriority") == r.o_orderpriority
            ).collect()
        )
        assert vals[0] <= r.p50 <= r.p90 <= r.p99 <= vals[-1]
        # p50 within the middle half of the distribution
        n = len(vals)
        assert vals[int(n * 0.25)] <= r.p50 <= vals[min(n - 1, int(n * 0.75))]
