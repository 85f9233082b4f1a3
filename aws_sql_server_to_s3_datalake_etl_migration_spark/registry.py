"""Query registry: name -> (Spark callable, optional DuckDB oracle SQL).

Workload modules register entries at import time; ``__spark_entry__``
exposes the combined catalog to the driver.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}

# Sessions that already received the engine's runtime confs (keyed by
# the Python session object's id — sessions are few and long-lived).
_CONFS_APPLIED: set[int] = set()


def _ensure_engine_confs(spark: SparkSession) -> None:
    """Apply engine runtime confs (rebase, AQE, nanosAsLong, ...) once
    per session. Driver-owned sessions reach query callables without
    going through ``session.get_spark``; this keeps conf scoping in the
    session layer instead of inside query bodies."""
    key = id(spark)
    if key in _CONFS_APPLIED:
        return
    from .session import apply_runtime_confs

    apply_runtime_confs(spark)
    _CONFS_APPLIED.add(key)


def register(name: str, oracle: str | None):
    """Decorator: add a query (and its oracle, or None for rows-only
    checks) to the catalog. The registered callable applies the engine's
    session confs once per session before running."""

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_engine_confs(spark)
            return fn(spark, sf_dir)

        _REGISTRY[name] = (wrapped, oracle)
        return wrapped

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracles() -> dict[str, str]:
    return {
        name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None
    }
