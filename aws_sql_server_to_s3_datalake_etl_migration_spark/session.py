"""SparkSession factory.

Reproduces the reference's session posture (``utils.py:23-27``: the five
parquet INT96 / datetime rebase configs that make pre-Gregorian SQL Server
datetimes round-trip safely) and adds the scale-oriented defaults the
reference inherited implicitly from Glue: AQE with skew-join handling,
FAIR scheduling so parallel in-process "jobs" share executors fairly
(replacing one-Glue-cluster-per-job, ``infra_utils.py:110``), and
Arrow-accelerated pandas interchange.

All knobs are set via ``.config`` *before* ``getOrCreate`` so a fresh
session is fully configured; on an existing session only dynamic SQL
confs apply.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Reference utils.py:23-27 — legacy timestamp rebase for parquet.
_REBASE_CONFS = {
    "spark.sql.legacy.parquet.int96RebaseModeInRead": "CORRECTED",
    "spark.sql.legacy.parquet.int96RebaseModeInWrite": "CORRECTED",
    "spark.sql.legacy.parquet.datetimeRebaseModeInRead": "CORRECTED",
    "spark.sql.legacy.parquet.datetimeRebaseModeInWrite": "CORRECTED",
    "spark.sql.parquet.int96AsTimestamp": "true",
}

_SCALE_CONFS = {
    # AQE re-plans at runtime: coalesces tiny shuffle partitions, converts
    # sort-merge joins to broadcast when the built side turns out small,
    # and splits skewed partitions — all essential at 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Without this, AQE refuses to coalesce the output partitioning of
    # any plan that gets cached — so iterative operators (coreness,
    # star CC) that persist a small per-round frame drag the full
    # spark.sql.shuffle.partitions task count through every round of
    # tiny jobs. Letting AQE re-shape cached plans turns those rounds
    # into single-task stages at small graph sizes while leaving big
    # shuffles untouched; downstream consumers never depend on a
    # persisted frame's partition COUNT, only its content.
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    # FAIR pools let run_parallel() share one session across jobs.
    "spark.scheduler.mode": "FAIR",
    # Arrow for pandas interchange (createDataFrame(pd), toPandas, UDFs).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # Compat only: on old runtimes that honor it, parquet TIMESTAMP(NANOS)
    # columns surface as raw int64 nanos instead of erroring. Spark >= 4.x
    # ignores this conf entirely; workloads._events branches on the
    # *observed* dtype, so the engine works either way.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}

# Evaluated and deliberately NOT set:
# - spark.sql.parquet.aggregatePushdown: only fires on DSv2 parquet
#   scans; parquet sits in the default useV1SourceList, and moving it
#   to V2 reshapes every audited plan for a micro-win on one watermark
#   probe. Revisit if the deployment standardizes on DSv2.
# - spark.sql.optimizer.runtime.bloomFilter.enabled: already true by
#   default on this runtime (verified) — big-big joins get runtime
#   row-level bloom pruning without extra conf.


def default_parallelism() -> int:
    """CPU budget: $SPARK_GRAFT_CPUS, else all local cores."""
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "pyspark-datalake-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``shuffle_partitions`` defaults to the core count — right for local
    mode; a real cluster deployment passes ~2-3x total executor cores.
    """
    cpus = default_parallelism()
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    confs: dict[str, str] = {}
    confs.update(_REBASE_CONFS)
    confs.update(_SCALE_CONFS)
    confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cpus)
    confs["spark.ui.enabled"] = "false"
    confs["spark.driver.memory"] = os.environ.get(
        "SPARK_GRAFT_DRIVER_MEM", "16g"
    )
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def apply_runtime_confs(spark: SparkSession) -> None:
    """Apply the dynamic subset of engine confs to an existing session
    (driver-owned sessions can't be rebuilt)."""
    for k, v in {**_REBASE_CONFS, **_SCALE_CONFS}.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a live session — keep going
