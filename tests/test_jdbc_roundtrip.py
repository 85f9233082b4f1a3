"""JDBC source/sink round-trip against embedded Derby (on Spark's own
classpath) — S1 full scan, S2 pushdown subquery, S11 append sink, and
the partitioned parallel read."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_sql_server_to_s3_datalake_etl_migration_spark.sources.readers import (
    read_jdbc,
)
from aws_sql_server_to_s3_datalake_etl_migration_spark.sources.writers import (
    write_jdbc_append,
)

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db_dir = tmp_path_factory.mktemp("derby") / "testdb"
    return f"jdbc:derby:{db_dir};create=true"


def test_jdbc_write_then_full_scan(spark, derby_url):
    df = spark.range(100).select(
        F.col("id").alias("pk"),
        (F.col("id") * 2).alias("val"),
        F.concat(F.lit("name_"), F.col("id")).cast("string").alias("name"),
    )
    write_jdbc_append(df, derby_url, "items", driver=DRIVER)
    back = read_jdbc(spark, derby_url, "items", driver=DRIVER)
    assert back.count() == 100
    assert back.agg(F.sum("val")).first()[0] == sum(2 * i for i in range(100))


def test_jdbc_pushdown_subquery(spark, derby_url):
    # S2: the filter/aggregation run inside the source DB, not in Spark
    # pushdown SQL is written in the SOURCE dialect (the reference's
    # contract too — utils.py:87 passes the caller's SQL Server SQL
    # through verbatim); Derby needs the quoted identifiers Spark
    # created the table with
    pushed = read_jdbc(
        spark,
        derby_url,
        "items",
        query='SELECT "pk", "val" FROM items WHERE "pk" < 10',
        driver=DRIVER,
    )
    assert pushed.count() == 10
    assert {c.lower() for c in pushed.columns} == {"pk", "val"}


def test_jdbc_partitioned_parallel_read(spark, derby_url):
    back = read_jdbc(
        spark,
        derby_url,
        "items",
        driver=DRIVER,
        partition_column="pk",
        num_partitions=4,
        lower_bound=0,
        upper_bound=100,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100


def test_jdbc_append_accumulates(spark, derby_url):
    extra = spark.range(100, 120).select(
        F.col("id").alias("pk"),
        (F.col("id") * 2).alias("val"),
        F.concat(F.lit("name_"), F.col("id")).cast("string").alias("name"),
    )
    write_jdbc_append(extra, derby_url, "items", driver=DRIVER)
    assert read_jdbc(spark, derby_url, "items", driver=DRIVER).count() == 120
