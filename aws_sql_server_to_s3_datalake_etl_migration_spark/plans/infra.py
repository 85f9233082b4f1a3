"""Infra bootstrap (O8, reference ``infra_utils.py:23-94,124-127``).

The reference idempotently created an S3 bucket, Glue databases, and a
JDBC crawler, then polled the crawler to READY. Spark-native, the whole
subsystem reduces to: `CREATE DATABASE IF NOT EXISTS` in the session
catalog (schemas register at write time, so there is nothing to crawl)
plus making the lake root exist. The reference's crawler-status state
machine (``utils.py:283-328``) has no equivalent left to port — that is
the point.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def bootstrap(
    spark: SparkSession,
    lake_root: str,
    databases: tuple[str, ...] = ("datalake", "metadata"),
) -> None:
    """Idempotent engine bootstrap: lake directory + catalog databases
    (the reference's bucket + `migrated-tables-db`/`rds-db` pair,
    ``infra_utils.py:124-127``)."""
    if "://" not in lake_root:  # local/posix path; object stores are
        os.makedirs(lake_root, exist_ok=True)  # created out-of-band
    for db in databases:
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")


def database_exists(spark: SparkSession, name: str) -> bool:
    return any(db.name == name for db in spark.catalog.listDatabases())
