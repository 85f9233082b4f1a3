"""Operational metastore (O6/S12/S13, reference ``utils.py:451-498``).

Append-only job-run records with the exact schema of ``utils.py:461-468``
(job_name, job_args, job_status, job_start_time, job_end_time,
job_duration), persisted as parquet (or JDBC via the generic sink).
"""

from __future__ import annotations

import math
import threading
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

METADATA_SCHEMA = StructType(
    [
        StructField("job_name", StringType(), False),
        StructField("job_args", StringType(), True),
        StructField("job_status", StringType(), True),
        StructField("job_start_time", TimestampType(), True),
        StructField("job_end_time", TimestampType(), True),
        StructField("job_duration", IntegerType(), True),
    ]
)


class OperationalMetastore:
    """Parquet-backed run log. ``record`` appends one row per finished
    job; ``read`` returns the queryable table."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        # Concurrent appends to one parquet path race on the Hadoop
        # committer's shared ``_temporary/0`` staging dir (job A's
        # commit-cleanup deletes job B's in-flight task files), so
        # record() serializes. Fine here: records are single control-
        # plane rows from one driver. Multi-driver deployments should
        # point the metastore at the JDBC sink (utils.py:481-490
        # analog), where the database serializes writers instead.
        self._append_lock = threading.Lock()

    def record(
        self,
        job_name: str,
        job_args: str,
        job_status: str,
        start: datetime,
        end: datetime | None,
    ) -> None:
        end = end or datetime.now(timezone.utc)
        duration = math.ceil((end - start).total_seconds())  # utils.py:372
        df = self.spark.createDataFrame(
            [
                (
                    job_name,
                    job_args,
                    job_status,
                    start.replace(tzinfo=None),
                    end.replace(tzinfo=None),
                    int(duration),
                )
            ],
            METADATA_SCHEMA,
        )
        with self._append_lock:
            df.write.mode("append").parquet(self.path)

    def read(self) -> DataFrame:
        return self.spark.read.schema(METADATA_SCHEMA).parquet(self.path)

    def last_success_durations(self) -> DataFrame:
        """R3 analog (reporting_utils.py:45-60): most recent SUCCEEDED
        run's duration per job — in-engine window, not a poll loop."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        w = Window.partitionBy("job_name").orderBy(
            F.col("job_end_time").desc()
        )
        return (
            self.read()
            .where(F.col("job_status") == "SUCCEEDED")
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(
                F.col("job_name").alias("TableName"),
                F.col("job_duration").alias("IngestionTime"),
            )
        )
