"""Oracle-differential tests: every SQL-expressible query in the catalog
must match DuckDB on row count, sorted column names, and values
(order-insensitive). This is the same gate the driver runs at sf0.01;
tests run at sf0.001 for speed.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from aws_sql_server_to_s3_datalake_etl_migration_spark import workloads

from conftest import SF_SMOKE

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    import datetime

    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            sample = df[c].dropna()
            if len(sample) and isinstance(
                sample.iloc[0], datetime.date
            ) and not isinstance(sample.iloc[0], datetime.datetime):
                # Spark DATE -> python date objects; DuckDB DATE ->
                # datetime64. Coerce both to datetime64[us].
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            else:
                df[c] = df[c].astype(str)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


@pytest.mark.parametrize("name", sorted(workloads.oracles()))
def test_query_matches_oracle(spark, duck, name):
    fn = workloads.queries()[name]
    spark_pdf = _normalize(fn(spark, SF_SMOKE).toPandas())
    duck_pdf = _normalize(duck.sql(workloads.oracles()[name]).df())
    assert list(spark_pdf.columns) == list(duck_pdf.columns)
    assert len(spark_pdf) == len(duck_pdf), f"{name}: row count mismatch"
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf, check_dtype=False, check_exact=True
    )


def test_rows_only_queries_run(spark):
    oracle_names = set(workloads.oracles())
    for name, fn in workloads.queries().items():
        if name not in oracle_names:
            df = fn(spark, SF_SMOKE)
            assert df.count() >= 0, name


def test_funnel_ordering_ties_and_stages(spark, tmp_path):
    """Funnel sequence semantics on a handcrafted log: a click BEFORE
    the first view never counts; a click at the SAME timestamp counts
    only if it sorts after the view on the event_id tiebreak; purchase
    requires a qualifying click first."""
    import aws_sql_server_to_s3_datalake_etl_migration_spark.workloads as wl

    rows = [
        # u1: clean view(t1) -> click(t2) -> purchase(t3)
        (10, "2024-01-01 00:00:01", 1, "view"),
        (11, "2024-01-01 00:00:02", 1, "click"),
        (12, "2024-01-01 00:00:03", 1, "purchase"),
        # u2: click before view -> stage 2 never reached
        (20, "2024-01-01 00:00:01", 2, "click"),
        (21, "2024-01-01 00:00:02", 2, "view"),
        (22, "2024-01-01 00:00:03", 2, "purchase"),
        # u3: same-ts view/click, view has SMALLER event_id -> click
        # sorts after the view and counts
        (30, "2024-01-01 00:00:01", 3, "view"),
        (31, "2024-01-01 00:00:01", 3, "click"),
        # u4: same-ts view/click, click sorts FIRST -> doesn't count
        (41, "2024-01-01 00:00:01", 4, "click"),
        (42, "2024-01-01 00:00:01", 4, "view"),
    ]
    src = str(tmp_path / "funnel_events")
    (
        spark.createDataFrame(
            rows, ["event_id", "ts_s", "user_id", "event_type"]
        )
        .select(
            "event_id",
            F.col("ts_s").cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        .write.mode("overwrite")
        .parquet(f"{src}/events.parquet")
    )
    out = wl.queries()["event_funnel_conversion"](spark, src).collect()[0]
    assert out.n_view == 4
    assert out.n_view_click == 2       # u1 and u3
    assert out.n_view_click_purchase == 1  # u1 only


def test_price_quantiles_approx_path_within_rank_error(spark, sf_dir):
    """The 100 TB drop-in (approx_percentile, t-digest) must land
    within its accuracy contract of the exact discrete quantiles the
    catalog query computes."""
    import aws_sql_server_to_s3_datalake_etl_migration_spark.workloads as wl

    exact = {
        r.c_mktsegment: r
        for r in wl.queries()["orders_price_quantiles"](
            spark, sf_dir
        ).collect()
    }
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_totalprice"
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    approx = {
        r.c_mktsegment: r.q
        for r in o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.percentile_approx(
                "o_totalprice", [0.5, 0.95, 0.99], 10000
            ).alias("q")
        )
        .collect()
    }
    for seg, e in exact.items():
        a50, a95, a99 = approx[seg]
        # rank error 1/10000 over ~1-2k rows/segment -> near-exact;
        # assert a loose relative bound so the test is stable
        assert abs(a50 - e.p50) / e.p50 < 0.02
        assert abs(a95 - e.p95) / e.p95 < 0.02
        assert abs(a99 - e.p99) / e.p99 < 0.02
