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


def _sessions_df(key, sessions, gap_us: int) -> pd.DataFrame:
    """Closed sessions -> output rows. ``session_end`` is last event
    time + gap, matching batch ``F.session_window`` exactly so the two
    paths are differentially testable."""
    return pd.DataFrame(
        {
            "user_id": pd.Series([key[0]] * len(sessions), dtype="int64"),
            "session_start": pd.Series(
                [pd.Timestamp(s, unit="us") for s, _, _ in sessions],
                dtype="datetime64[us]",
            ),
            "session_end": pd.Series(
                [pd.Timestamp(l + gap_us, unit="us") for _, l, _ in sessions],
                dtype="datetime64[us]",
            ),
            "n_events": pd.Series([n for _, _, n in sessions], dtype="int64"),
        }
    )


def _session_fn(
    key,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    gap_ms: int = 30_000,
    flush_after_ms: int | None = None,
    event_time: bool = False,
):
    """Event-time gap sessionization per user. Sessions split on
    *event-time* gaps > ``gap_ms`` (same boundaries as batch
    ``F.session_window``); the timeout only flushes the still-open
    trailing session. With ``event_time`` the flush is watermark-driven
    (deterministic: once the watermark passes last_event + gap no
    earlier event can arrive, so the session is definitively closed);
    otherwise a processing-time inactivity timer flushes it. Late
    cross-batch events merge into the open session (best-effort in
    processing-time mode; impossible by construction in event-time mode
    once flushed)."""
    gap_us = gap_ms * 1000
    if state.hasTimedOut:
        sessions = [tuple(state.get)] if state.exists else []
        state.remove()
        yield _sessions_df(key, sessions, gap_us)
        return
    ts_us: list[int] = []
    for pdf in pdfs:
        ts = pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000
        ts_us.extend(int(t) for t in ts.tolist())
    # Fold the stored open session in as an *interval* item, ordered by
    # its start. A cross-batch event earlier than the stored start then
    # sessionizes on its own timeline: if it sits more than gap before
    # the stored session it closes as a separate session rather than
    # folding in via min(start, t) and silently spanning a gap > gap_ms.
    items: list[tuple[int, int, int]] = [(t, t, 1) for t in ts_us]
    if state.exists:
        items.append(tuple(state.get))
    items.sort()
    start = last = n = None
    closed: list[tuple[int, int, int]] = []
    for lo, hi, cnt in items:
        if start is None:
            start, last, n = lo, hi, cnt
        elif lo - last > gap_us:
            closed.append((start, last, n))
            start, last, n = lo, hi, cnt
        else:
            last, n = max(last, hi), n + cnt
    if start is not None:
        state.update((int(start), int(last), int(n)))
        if event_time:
            # flush when the watermark passes session end; Spark
            # requires the timeout timestamp to be beyond the current
            # watermark, so clamp for sessions already closable
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(last // 1000 + gap_ms, wm + 1))
        else:
            # inactivity flush; override for replay scenarios where the
            # event-time gap far exceeds tolerable wall-clock wait
            state.setTimeoutDuration(int(flush_after_ms or gap_ms))
    yield _sessions_df(key, closed, gap_us)


def sessionize(
    events: DataFrame,
    gap_ms: int = 30_000,
    flush_after_ms: int | None = None,
    event_time: bool = False,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Inactivity-gap sessionization (custom stateful streaming op).
    Input needs ``user_id`` and micros-precision ``ts`` columns.
    Session boundaries are event-time gaps > ``gap_ms`` — identical to
    batch ``F.session_window(ts, gap)`` (see workloads.
    event_session_stats).

    Flush modes for the open trailing session:

    - ``event_time=True`` (production): a watermark (``watermark_delay``
      behind max event time) drives an event-time timeout — sessions
      emit deterministically as data arrives, independent of wall
      clock, and state is bounded by the watermark.
    - default: a processing-time inactivity timer (``flush_after_ms``
      or the gap) — useful for replay/testing where event time is far
      from wall time.
    """
    import functools

    if event_time:
        events = events.withWatermark("ts", watermark_delay)
    return events.groupBy("user_id").applyInPandasWithState(
        functools.partial(
            _session_fn,
            gap_ms=gap_ms,
            flush_after_ms=flush_after_ms,
            event_time=event_time,
        ),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if event_time
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "5 minutes",
    watermark_delay: str = "2 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream equi-join with a bounded time-range
    condition (right event within ``within`` AFTER the left event).

    Both inputs carry a watermark and the join predicate bounds the
    event-time distance, so Spark can evict buffered state once the
    watermark passes — the requirement for an unbounded-stream join to
    run with bounded memory. Without the range condition the state
    grows forever; this wrapper makes the bounded form the only way to
    express the join.

    Column collisions are avoided by prefixing the right side (``r_``)
    except the join key.
    """
    lw = left.withWatermark(left_ts, watermark_delay)
    rw = right.withWatermark(right_ts, watermark_delay)
    for c in rw.columns:
        if c != on:
            rw = rw.withColumnRenamed(c, f"r_{c}")
    r_ts = f"r_{right_ts}" if right_ts != on else right_ts
    cond = (
        (lw[on] == rw[on])
        & (F.col(r_ts) >= F.col(left_ts))
        & (F.col(r_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, how).drop(rw[on])
