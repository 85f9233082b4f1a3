"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship nis_policies-shaped query at
sf0.001; ``queries()`` / ``oracle_sql()`` expose the full catalog from
``aws_sql_server_to_s3_datalake_etl_migration_spark.workloads`` (each
Spark implementation paired with a DuckDB oracle).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aws_sql_server_to_s3_datalake_etl_migration_spark import workloads
from aws_sql_server_to_s3_datalake_etl_migration_spark.session import (
    apply_runtime_confs,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    apply_runtime_confs(spark)
    return workloads.flagship_policies_ingest(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return workloads.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each SQL-expressible query."""
    return workloads.oracles()
