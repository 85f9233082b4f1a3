"""Query registry: name -> (Spark callable, optional DuckDB oracle SQL).

Workload modules register entries at import time; ``__spark_entry__``
exposes the combined catalog to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, oracle: str | None):
    """Decorator: add a query (and its oracle, or None for rows-only
    checks) to the catalog."""

    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracles() -> dict[str, str]:
    return {
        name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None
    }
