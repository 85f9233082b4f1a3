"""Streaming windowed aggregation and custom stateful operators.

``windowed_event_counts``: tumbling event-time window with a watermark
(late rows beyond the delay are dropped, state is bounded — the
requirement for unbounded streams).

``sessionize``: custom stateful operator via ``applyInPandasWithState``
— groups events into inactivity-gap sessions, emitting one row per
closed session. This is the pattern for operators Spark lacks natively.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 minute",
    watermark_delay: str = "2 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts per key with a late-data watermark."""
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_duration), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start", TimestampType(), True),
        StructField("session_end", TimestampType(), True),
        StructField("n_events", LongType(), True),
    ]
)

_STATE_SCHEMA = "start_us LONG, last_us LONG, n LONG"


def _session_fn(
    key,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    gap_ms: int = 30_000,
):
    """Accumulate (start, last, n) per user; close the session when the
    processing-time timeout fires after the inactivity gap."""
    if state.hasTimedOut:
        start_us, last_us, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n],
            }
        )
        return
    start_us = last_us = None
    n = 0
    if state.exists:
        start_us, last_us, n = state.get
    for pdf in pdfs:
        ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
        if ts_us:
            lo, hi = min(ts_us), max(ts_us)
            start_us = lo if start_us is None else min(start_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
            n += len(ts_us)
    if start_us is not None:
        state.update((int(start_us), int(last_us), int(n)))
        state.setTimeoutDuration(gap_ms)  # inactivity gap
    yield pd.DataFrame(
        {
            "user_id": pd.Series([], dtype="int64"),
            "session_start": pd.Series([], dtype="datetime64[us]"),
            "session_end": pd.Series([], dtype="datetime64[us]"),
            "n_events": pd.Series([], dtype="int64"),
        }
    )


def sessionize(events: DataFrame, gap_ms: int = 30_000) -> DataFrame:
    """Inactivity-gap sessionization (custom stateful streaming op).
    Input needs ``user_id`` and micros-precision ``ts`` columns."""
    import functools

    return events.groupBy("user_id").applyInPandasWithState(
        functools.partial(_session_fn, gap_ms=gap_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
