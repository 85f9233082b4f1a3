"""DeltaTable-shaped object API over the fallback lake engine.

delta-spark users drive tables through ``DeltaTable.forPath(...)``
(the reference MERGEs through it, ``utils.py:222-230``); this module
gives the SAME ergonomic surface over ``sources/delta_log.py`` so a
user migrating off the reference keeps their call shapes:

    t = LakeTable.forPath(spark, "/lake/orders")
    t.update(F.col("status") == "open", {"status": F.lit("closed")})
    t.delete(F.col("ts") < cutoff)
    t.optimize(zorder_by=["custkey"])
    t.restoreToVersion(41)
    t.history()                      # DESCRIBE HISTORY
    t.detail()                       # DESCRIBE DETAIL
    t.clone("/lake/orders_sandbox")  # SHALLOW CLONE
    t.vacuum(dry_run=True)

Every method is a thin, documented delegation to the module-level
engine functions — one source of truth for semantics; this class owns
only the ergonomics. All operations inherit the engine's guarantees:
atomic rename-claimed commits, write-serializable conflict rebase,
append-only/protocol gating, spec checkpoints, time travel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import delta_log


class LakeTable:
    """Handle on one log-backed table (``DeltaTable`` analogue)."""

    def __init__(self, spark: SparkSession, path: str):
        self._spark = spark
        self._path = path.rstrip("/")

    # -- construction -------------------------------------------------
    @classmethod
    def forPath(cls, spark: SparkSession, path: str) -> "LakeTable":
        """Resolve an EXISTING log-backed table (raises on a plain
        directory, like ``DeltaTable.forPath``)."""
        if delta_log.log_version(spark, path) is None:
            raise ValueError(
                f"{path} is not a Delta table (no transaction log)"
            )
        return cls(spark, path)

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema_ddl: str,
        partition_by: list[str] | None = None,
        generated: dict[str, str] | None = None,
        configuration: dict[str, str] | None = None,
    ) -> "LakeTable":
        """CREATE TABLE without data (:func:`delta_log.create_table`)."""
        delta_log.create_table(
            spark,
            path,
            schema_ddl,
            partition_by=partition_by,
            generated=generated,
            configuration=configuration,
        )
        return cls(spark, path)

    @classmethod
    def isDeltaTable(cls, spark: SparkSession, path: str) -> bool:
        return delta_log.log_version(spark, path) is not None

    # -- reads --------------------------------------------------------
    def toDF(
        self,
        version: int | None = None,
        timestamp_ms: int | None = None,
        partition_filter: dict[str, str] | None = None,
        stats_filter: list[tuple] | None = None,
    ) -> DataFrame:
        from .readers import read_delta

        return read_delta(
            self._spark,
            self._path,
            version=version,
            timestamp_ms=timestamp_ms,
            partition_filter=partition_filter,
            stats_filter=stats_filter,
        )

    def version(self) -> int:
        v = delta_log.log_version(self._spark, self._path)
        assert v is not None  # forPath/create guarantee a log
        return v

    def history(self) -> list[dict]:
        return delta_log.table_history(self._spark, self._path)

    def detail(self) -> dict:
        return delta_log.table_detail(self._spark, self._path)

    def fsck(self) -> dict:
        return delta_log.fsck(self._spark, self._path)

    # -- row-level mutations -------------------------------------------
    def append(self, df: DataFrame, **kwargs) -> int | None:
        """Append ``df`` (schema-enforced; ``merge_schema=`` /
        ``txn_app_id=``/``txn_version=`` pass through)."""
        md = delta_log.latest_metadata(self._spark, self._path) or {}
        parts = list(md.get("partitionColumns") or []) or None
        return delta_log.append_commit(
            df, self._path, partition_by=parts, **kwargs
        )

    def update(self, condition, set_exprs: dict) -> int:
        return delta_log.update_where(
            self._spark, self._path, condition, set_exprs
        )

    def delete(self, condition) -> int:
        return delta_log.delete_where(self._spark, self._path, condition)

    def replaceWhere(self, condition, df: DataFrame) -> int:
        return delta_log.replace_where(
            self._spark, self._path, condition, df
        )

    def merge(
        self, incoming: DataFrame, primary_key: str,
        delete_col: str | None = None,
    ) -> None:
        """Keyed MERGE (whenMatchedUpdateAll / whenNotMatchedInsertAll,
        optional whenMatchedDelete via ``delete_col``) with automatic
        re-merge on lost commit races."""
        from ..operators.incremental import merge_upsert

        merge_upsert(
            self._spark, incoming, self._path, primary_key,
            delete_col=delete_col,
        )

    # -- maintenance ----------------------------------------------------
    def optimize(
        self,
        zorder_by: list[str] | None = None,
        partition_filter: dict[str, str] | None = None,
        **kwargs,
    ) -> int | None:
        return delta_log.compact(
            self._spark,
            self._path,
            zorder_by=zorder_by,
            partition_filter=partition_filter,
            **kwargs,
        )

    def checkpoint(self, parts: int | None = None) -> int:
        return delta_log.write_checkpoint(
            self._spark, self._path, parts=parts
        )

    def truncateLog(self, retain_checkpoints: int = 2) -> int:
        return delta_log.truncate_log(
            self._spark,
            self._path,
            retain_checkpoints=retain_checkpoints,
        )

    def checkpointVersion(self) -> int | None:
        return delta_log.latest_checkpoint_version(
            self._spark, self._path
        )

    def vacuum(
        self, min_age_seconds: int = 3600, dry_run: bool = False
    ) -> list[str]:
        return delta_log.vacuum(
            self._spark,
            self._path,
            min_age_seconds=min_age_seconds,
            dry_run=dry_run,
        )

    def restoreToVersion(self, version: int) -> int:
        return delta_log.restore_to_version(
            self._spark, self._path, version
        )

    # -- DDL -------------------------------------------------------------
    def addCheckConstraint(self, name: str, sql_expr: str) -> int:
        return delta_log.add_check_constraint(
            self._spark, self._path, name, sql_expr
        )

    def dropCheckConstraint(self, name: str) -> int:
        return delta_log.drop_check_constraint(
            self._spark, self._path, name
        )

    def renameColumn(self, old: str, new: str) -> int:
        return delta_log.rename_column(self._spark, self._path, old, new)

    def dropColumn(self, column: str) -> int:
        return delta_log.drop_column(self._spark, self._path, column)

    def addGeneratedColumn(
        self, name: str, data_type: str, expression: str
    ) -> int:
        return delta_log.add_generated_column(
            self._spark, self._path, name, data_type, expression
        )

    def setProperty(self, key: str, value: str) -> int:
        return delta_log.set_table_property(
            self._spark, self._path, key, value
        )

    def clone(
        self, target_path: str, version: int | None = None
    ) -> "LakeTable":
        """SHALLOW CLONE this table (zero-copy, optionally pinned
        VERSION AS OF) and return a handle on the clone."""
        delta_log.clone_table(
            self._spark, self._path, target_path, version=version
        )
        return LakeTable(self._spark, target_path)

    # -- CDF --------------------------------------------------------------
    def tableChanges(
        self, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        return delta_log.table_changes(
            self._spark, self._path, from_version, to_version=to_version
        )

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return f"LakeTable({self._path!r})"
