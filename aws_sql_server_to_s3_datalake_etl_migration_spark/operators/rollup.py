"""Continuous-aggregate maintenance: keep a time-bucketed rollup table
fresh by folding in only newly-arrived events (incremental view
maintenance for algebraic aggregates — the hypertable
continuous-aggregate pattern).

COUNT and SUM are additive, so a refresh is: partial-aggregate the new
batch (O(batch)), union with the existing rollup, and re-aggregate.
The regroup shuffles O(|rollup| + |batch|) *aggregated* rows — never
the raw history — so refresh cost is independent of total corpus size.
Non-additive aggregates (exact COUNT DISTINCT) don't fit this shape;
use the sketch operators (HLL merges are additive) for those.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import fs
from ..sources.writers import swap_overwrite


def rollup_events(
    events: DataFrame,
    bucket: str = "hour",
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    distinct_col: str | None = None,
) -> DataFrame:
    """One time-bucketed aggregate pass: (bucket, keys) ->
    n_events + exact DECIMAL sum of ``value_col``. With
    ``distinct_col``, also an HLL sketch of its distinct values —
    sketches are *mergeable*, which is what makes approximate
    COUNT DISTINCT maintainable incrementally (exact distinct is not
    additive and would need the raw history every refresh)."""
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        # fixed decimal(38,4) so the schema is stable across
        # refreshes (SUM widens precision otherwise)
        F.sum(F.col(value_col).cast("decimal(18,4)"))
        .cast("decimal(38,4)")
        .alias("sum_value"),
    ]
    if distinct_col is not None:
        aggs.append(F.hll_sketch_agg(distinct_col).alias("distinct_sketch"))
    return events.groupBy(
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
        *[F.col(c) for c in key_cols],
    ).agg(*aggs)


def incremental_rollup_refresh(
    spark: SparkSession,
    new_events: DataFrame,
    rollup_path: str,
    bucket: str = "hour",
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    distinct_col: str | None = None,
) -> DataFrame:
    """Fold ``new_events`` into the rollup table at ``rollup_path``
    (bootstrap if absent) and atomically swap it. Returns the refreshed
    rollup. Idempotence is the caller's contract: feed each event batch
    exactly once (pair with the high-watermark reader,
    operators/incremental.py, which yields exactly the unseen rows).
    """
    partial = rollup_events(
        new_events, bucket, ts_col, key_cols, value_col, distinct_col
    )
    if fs.path_exists(spark, rollup_path):
        existing = spark.read.parquet(rollup_path)
        aggs = [
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").cast("decimal(38,4)").alias("sum_value"),
        ]
        if distinct_col is not None:
            aggs.append(
                F.hll_union_agg("distinct_sketch").alias("distinct_sketch")
            )
        combined = (
            existing.unionByName(partial)
            .groupBy("bucket", *key_cols)
            .agg(*aggs)
        )
    else:
        combined = partial
    swap_overwrite(combined, rollup_path)
    return spark.read.parquet(rollup_path)


def with_distinct_estimate(
    rollup: DataFrame, out_col: str = "n_distinct_est"
) -> DataFrame:
    """Materialize the HLL estimate from a rollup's sketch column."""
    return rollup.withColumn(
        out_col, F.hll_sketch_estimate("distinct_sketch")
    )
