"""Oracle-differential tests: every SQL-expressible query in the catalog
must match DuckDB on row count, sorted column names, and values
(order-insensitive). This is the same gate the driver runs at sf0.01;
tests run at sf0.001 for speed.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

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
