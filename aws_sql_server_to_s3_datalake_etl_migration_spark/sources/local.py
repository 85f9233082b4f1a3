"""Local-data sources (S13, ``utils.py:460-471`` and
``reporting_utils.py:42,60,74``): driver-side rows / pandas frames
promoted to DataFrames. Only for *small control metadata* — data-plane
tables must come from distributed readers."""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def create_dataframe_from_rows(
    spark: SparkSession, rows: Iterable, schema: StructType | str
) -> DataFrame:
    """Rows + explicit schema → DataFrame (``utils.py:470``)."""
    return spark.createDataFrame(list(rows), schema)


def create_dataframe_from_pandas(
    spark: SparkSession, pdf: pd.DataFrame
) -> DataFrame:
    """pandas → Spark, Arrow-accelerated (``reporting_utils.py:42``)."""
    return spark.createDataFrame(pdf)
