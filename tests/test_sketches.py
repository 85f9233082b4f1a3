"""Sketch aggregates carry their accuracy assertions in-query (the
estimate_ok / pNN_ok flag columns — computed in Spark against exact
in-engine answers, hash-checked by the DuckDB oracle). These tests pin
the same contract locally and keep the flags honest."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_sql_server_to_s3_datalake_etl_migration_spark import workloads

from conftest import SF_SMOKE


def test_approx_distinct_within_tolerance(spark):
    rows = workloads.queries()["approx_distinct_users"](
        spark, SF_SMOKE
    ).collect()
    assert rows, "no event types"
    exact = {
        r.event_type: r.exact
        for r in workloads._events(spark, SF_SMOKE)
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    for r in rows:
        assert r.estimate_ok == 1, (r.event_type, "HLL estimate out of band")
        assert r.exact_users == exact[r.event_type]


def test_percentiles_bracket_exact_values(spark):
    rows = workloads.queries()["order_value_percentiles"](
        spark, SF_SMOKE
    ).collect()
    assert rows, "no priorities"
    n_orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").count()
    for r in rows:
        # each sketch value must bracket its quantile by rank (the flag
        # is computed in-engine; a broken sketch flips it to 0)
        assert r.p50_ok == 1 and r.p90_ok == 1 and r.p99_ok == 1, r
    assert sum(r.n_orders for r in rows) == n_orders
