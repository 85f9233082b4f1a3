"""Structured Streaming tests: exactly-once file ingest, windowed
watermark aggregation, custom stateful sessionization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_sql_server_to_s3_datalake_etl_migration_spark.streaming import (
    sessionize,
    stream_append_to_lake,
    stream_dedup,
    stream_ingest_files,
    stream_merge_to_lake,
    windowed_event_counts,
)


def test_stream_dedup_drops_redelivered_keys(spark, tmp_path):
    src = tmp_path / "dd_landing"
    src.mkdir()
    out = str(tmp_path / "dd_out")
    ckpt = str(tmp_path / "dd_ckpt")
    rows = [
        (1, "2024-01-01 00:00:01", "a"),
        (2, "2024-01-01 00:00:02", "b"),
        (1, "2024-01-01 00:00:03", "a-dup"),  # re-delivery of key 1
    ]
    (
        spark.createDataFrame(rows, ["event_id", "ts_s", "payload"])
        .select(
            "event_id",
            F.col("ts_s").cast("timestamp").alias("ts"),
            "payload",
        )
        .coalesce(1)
        .write.parquet(str(src / "b1"))
    )
    deduped = stream_dedup(
        stream_ingest_files(
            spark,
            str(src / "*"),
            "event_id BIGINT, ts TIMESTAMP, payload STRING",
        ),
        ["event_id"],
    )
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 2
    assert {r.event_id for r in got.collect()} == {1, 2}


def test_stream_merge_upserts_per_batch(spark, tmp_path):
    src = tmp_path / "merge_landing"
    src.mkdir()
    lake = str(tmp_path / "merge_lake")
    ckpt = str(tmp_path / "merge_ckpt")
    schema = "pk BIGINT, v STRING"

    def drain():
        q = stream_merge_to_lake(
            stream_ingest_files(spark, str(src / "*"), schema),
            lake,
            ckpt,
            primary_key="pk",
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [(1, "a"), (2, "b")], schema
    ).write.parquet(str(src / "b1"))
    drain()
    # batch 2 updates pk=2 and inserts pk=3
    spark.createDataFrame(
        [(2, "B2"), (3, "c")], schema
    ).write.parquet(str(src / "b2"))
    drain()
    got = {r.pk: r.v for r in spark.read.parquet(lake).collect()}
    assert got == {1: "a", 2: "B2", 3: "c"}


def test_stream_ingest_exactly_once(spark, tmp_path):
    src = tmp_path / "landing"
    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    spark.range(0, 10).withColumn("v", F.col("id") * 2).write.parquet(
        str(src / "batch1"), mode="overwrite"
    )
    schema = "id BIGINT, v BIGINT"
    # drain batch 1
    stream = stream_ingest_files(spark, str(src / "*"), schema)
    q = stream_append_to_lake(stream, lake, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(lake).count() == 10
    # add batch 2; re-drain: only new files are processed (checkpoint)
    spark.range(10, 15).withColumn("v", F.col("id") * 2).write.parquet(
        str(src / "batch2"), mode="overwrite"
    )
    q2 = stream_append_to_lake(
        stream_ingest_files(spark, str(src / "*"), schema), lake, ckpt
    )
    q2.awaitTermination(120)
    out = spark.read.parquet(lake)
    assert out.count() == 15  # no duplicates from batch 1
    assert out.select(F.sum("id")).first()[0] == sum(range(15))


def test_windowed_counts_batch_semantics(spark):
    # windowed agg validated on a batch frame (same expression tree the
    # stream runs); watermark semantics are exercised in the stream test
    rows = [
        ("2024-01-01 00:00:10", "click", 1.0),
        ("2024-01-01 00:00:50", "click", 2.0),
        ("2024-01-01 00:01:10", "view", 3.0),
    ]
    df = spark.createDataFrame(rows, ["ts_s", "event_type", "value"]).select(
        F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value"
    )
    out = windowed_event_counts(df).collect()
    got = {
        (str(r.window_start), r.event_type): (r.n_events, r.sum_value)
        for r in out
    }
    assert got[("2024-01-01 00:00:00", "click")] == (2, 3.0)
    assert got[("2024-01-01 00:01:00", "view")] == (1, 3.0)


def test_watermark_drops_late_rows_in_stream(spark, tmp_path):
    """True streaming semantics: a row older than the watermark is
    dropped, so the finalized window excludes it."""
    import os
    import time as _time

    src = tmp_path / "wm_landing"
    src.mkdir()
    out = str(tmp_path / "wm_out")
    ckpt = str(tmp_path / "wm_ckpt")

    def write_batch(name, rows, mtime):
        (
            spark.createDataFrame(rows, ["ts_s", "event_type", "value"])
            .select(
                F.col("ts_s").cast("timestamp").alias("ts"),
                "event_type",
                "value",
            )
            .coalesce(1)  # ONE data file: a micro-batch per logical batch
            .write.parquet(str(src / name))
        )
        for root, _dirs, files in os.walk(src / name):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))
        os.utime(src / name, (mtime, mtime))

    t0 = _time.time() - 1000
    # batch 1: one row in window [10:00,10:01)
    write_batch("b1", [("2024-01-01 10:00:10", "click", 1.0)], t0)
    # batch 2: advances the watermark past that window (10:10-2m=10:08)
    write_batch("b2", [("2024-01-01 10:10:00", "click", 1.0)], t0 + 10)
    # batch 3: carrier batch — the late-row filter applies the watermark
    # with one batch of lag, so give the 10:08 watermark a batch to land
    write_batch("b3", [("2024-01-01 10:11:00", "click", 1.0)], t0 + 20)
    # batch 4: a LATE row for the long-passed window -> dropped
    write_batch("b4", [("2024-01-01 10:00:30", "click", 5.0)], t0 + 30)
    # batch 5: far-future row to flush remaining windows
    write_batch("b5", [("2024-01-01 11:00:00", "click", 1.0)], t0 + 40)

    stream = stream_ingest_files(
        spark,
        str(src / "*"),
        "ts TIMESTAMP, event_type STRING, value DOUBLE",
        max_files_per_trigger=1,  # one file per micro-batch, in order
    )
    q = (
        windowed_event_counts(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        str(r.window_start): (r.n_events, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    # the late 10:00:30 row (value 5.0) must NOT be in the 10:00 window
    assert got.get("2024-01-01 10:00:00") == (1, 1.0), got


def _run_sessions_until(
    spark, sessions_df, out_dir, ckpt, n_expected, timeout_s=240
):
    """Start the sessionize sink, poll the parquet output until
    ``n_expected`` session rows landed, then stop the query. Stateful
    processing-time timeouts keep an availableNow query alive on this
    runtime (timeout-flush micro-batches are scheduled after the data
    drains), so termination never happens — observed-output is the
    correct completion signal, and stopping only after the expected
    rows appear never aborts a flush batch mid-write."""
    import time

    q = (
        sessions_df.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        t0 = time.time()
        while time.time() - t0 < timeout_s:
            if q.awaitTermination(3):
                break
            try:
                if spark.read.parquet(out_dir).count() >= n_expected:
                    break
            except Exception:
                pass  # sink not committed yet
    finally:
        if q.isActive:
            q.stop()
    return spark.read.parquet(out_dir)


def test_sessionize_stateful_stream(spark, tmp_path):
    src = tmp_path / "sessions_in"
    src.mkdir()
    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:00:05"),
        (2, "2024-01-01 00:00:01"),
    ]
    (
        spark.createDataFrame(rows, ["user_id", "ts_s"])
        .select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
        .write.parquet(str(src / "b1"))
    )
    out_dir = str(tmp_path / "sessions_out")
    ckpt = str(tmp_path / "sess_ckpt")
    sessions = sessionize(
        stream_ingest_files(
            spark, str(src / "*"), "user_id BIGINT, ts TIMESTAMP"
        ),
        gap_ms=2_000,
    )
    # 3 sessions total: user 1's events are 5 s apart (> 2 s gap) so the
    # event-time split yields two single-event sessions + user 2's one;
    # the open trailing sessions flush via the processing-time timeout.
    out = _run_sessions_until(spark, sessions, out_dir, ckpt, n_expected=3)
    by_user: dict = {}
    for r in out.collect():
        by_user.setdefault(r.user_id, []).append(r)
    assert sorted(r.n_events for r in by_user[1]) == [1, 1]
    assert [r.n_events for r in by_user[2]] == [1]
    s = min(by_user[1], key=lambda r: r.session_start)
    # session_window parity: end = last event + gap
    assert (s.session_end - s.session_start).total_seconds() == 2.0


def test_stream_enrich_picks_up_dim_updates(spark, tmp_path):
    """Stream-static join: facts are enriched per micro-batch, and a
    dimension change between drains is visible without restarting —
    the static side is re-read each batch."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark.streaming import (
        stream_enrich,
    )

    src = tmp_path / "enrich_landing"
    dim_path = str(tmp_path / "dim")
    lake = str(tmp_path / "enriched")
    ckpt = str(tmp_path / "enrich_ckpt")
    src.mkdir()
    spark.createDataFrame(
        [(1, "bronze"), (2, "gold")], ["cust_id", "tier"]
    ).write.parquet(dim_path)
    spark.createDataFrame(
        [(100, 1), (101, 2), (102, 3)], ["order_id", "cust_id"]
    ).write.parquet(str(src / "b1"))

    def drain():
        stream = stream_ingest_files(
            spark, str(src / "*"), "order_id BIGINT, cust_id BIGINT"
        )
        dim = spark.read.parquet(dim_path)
        q = stream_append_to_lake(
            stream_enrich(stream, dim, on="cust_id"), lake, ckpt
        )
        q.awaitTermination(120)

    drain()
    out = {r.order_id: r.tier for r in spark.read.parquet(lake).collect()}
    # left join: unknown cust 3 still lands, null tier
    assert out == {100: "bronze", 101: "gold", 102: None}

    # dim update + new facts: the next drain joins against the NEW dim
    spark.createDataFrame(
        [(1, "silver"), (2, "gold"), (3, "bronze")], ["cust_id", "tier"]
    ).write.mode("overwrite").parquet(dim_path)
    spark.createDataFrame(
        [(103, 1), (104, 3)], ["order_id", "cust_id"]
    ).write.parquet(str(src / "b2"))
    drain()
    out2 = {r.order_id: r.tier for r in spark.read.parquet(lake).collect()}
    assert out2[103] == "silver" and out2[104] == "bronze"
    assert out2[100] == "bronze"  # batch-1 results immutable in the lake


def test_sessionize_stream_matches_batch_session_window(spark, tmp_path, sf_dir):
    """Differential: replay the real events table through the stateful
    streaming sessionizer and through batch F.session_window (the
    event_session_stats query) — the session sets must be identical."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark.workloads import (
        event_session_stats,
        _events,
    )

    gap_ms = 6 * 3600 * 1000  # event_session_stats' 6-hour gap

    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in event_session_stats(spark, sf_dir).collect()
    }

    src = tmp_path / "events_in"
    src.mkdir()
    (
        _events(spark, sf_dir)
        .select("user_id", "ts")
        .write.parquet(str(src / "b1"))
    )
    out_dir = str(tmp_path / "sessions_out")
    ckpt = str(tmp_path / "sess_ckpt")
    sessions = sessionize(
        stream_ingest_files(
            spark, str(src / "*"), "user_id BIGINT, ts TIMESTAMP"
        ),
        gap_ms=gap_ms,
        flush_after_ms=1_000,  # wall-clock flush, not 6 h
    )
    out = _run_sessions_until(
        spark, sessions, out_dir, ckpt, n_expected=len(batch)
    )
    stream = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in out.collect()
    }
    assert stream == batch


def test_stream_stream_join_bounded_state(spark, tmp_path):
    """Watermarked stream-stream join: a purchase joins the views of
    the same user that happened in the 5 minutes before it; an older
    view falls outside the range condition and is excluded."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark.streaming import (
        stream_stream_join,
    )

    views = tmp_path / "views_in"
    buys = tmp_path / "buys_in"
    views.mkdir()
    buys.mkdir()
    (
        spark.createDataFrame(
            [
                (1, "2024-01-01 10:00:00"),  # inside the 5-min window
                (1, "2024-01-01 09:50:00"),  # too old -> excluded
                (2, "2024-01-01 10:03:00"),  # inside for user 2
                (3, "2024-01-01 10:00:00"),  # user never purchases
            ],
            ["user_id", "ts_s"],
        )
        .select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
        .write.parquet(str(views / "b1"))
    )
    (
        spark.createDataFrame(
            [(1, "2024-01-01 10:04:00"), (2, "2024-01-01 10:04:30")],
            ["user_id", "ts_s"],
        )
        .select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
        .write.parquet(str(buys / "b1"))
    )
    joined = stream_stream_join(
        stream_ingest_files(
            spark, str(views / "*"), "user_id BIGINT, ts TIMESTAMP"
        ),
        stream_ingest_files(
            spark, str(buys / "*"), "user_id BIGINT, ts TIMESTAMP"
        ),
        on="user_id",
        within="5 minutes",
    )
    out = str(tmp_path / "ssj_out")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ssj_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    if q.isActive:
        q.stop()
    rows = spark.read.parquet(out).collect()
    got = {(r.user_id, str(r.ts), str(r.r_ts)) for r in rows}
    assert got == {
        (1, "2024-01-01 10:00:00", "2024-01-01 10:04:00"),
        (2, "2024-01-01 10:03:00", "2024-01-01 10:04:30"),
    }


def test_sessionize_event_time_flush_deterministic(spark, tmp_path):
    """Event-time mode: the watermark, not wall clock, flushes closed
    sessions — replaying historical data emits them immediately."""
    src = tmp_path / "et_in"
    src.mkdir()
    (
        spark.createDataFrame(
            [
                (1, "2024-01-01 10:00:00"),
                (1, "2024-01-01 10:00:05"),
                (2, "2024-01-01 10:00:01"),
            ],
            ["user_id", "ts_s"],
        )
        .select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
        .coalesce(1)
        .write.parquet(str(src / "b1"))
    )
    # a much later event advances the watermark far past every open
    # session's (last + gap), firing their event-time timeouts
    (
        spark.createDataFrame([(1, "2024-01-01 12:00:00")], ["user_id", "ts_s"])
        .select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
        .coalesce(1)
        .write.parquet(str(src / "b2"))
    )
    sessions = sessionize(
        stream_ingest_files(
            spark,
            str(src / "*"),
            "user_id BIGINT, ts TIMESTAMP",
            max_files_per_trigger=1,
        ),
        gap_ms=60_000,
        event_time=True,
        watermark_delay="1 second",
    )
    out = _run_sessions_until(
        spark,
        sessions,
        str(tmp_path / "et_out"),
        str(tmp_path / "et_ckpt"),
        n_expected=2,
        timeout_s=180,
    )
    got = {(r.user_id, str(r.session_start), r.n_events) for r in out.collect()}
    # user 1's 10:00 session (2 events, 5s apart < 60s gap) and user
    # 2's single-event session flushed by the watermark; user 1's
    # 12:00 session is still open (watermark never passed its end)
    assert (1, "2024-01-01 10:00:00", 2) in got
    assert (2, "2024-01-01 10:00:01", 1) in got
    assert all(not (u == 1 and s.startswith("2024-01-01 12")) for u, s, _ in got)


def test_windowed_counts_stream_matches_batch(spark, tmp_path, sf_dir):
    """Differential: the real events table streamed through the
    watermarked tumbling-window agg must produce exactly the batch
    groupBy(window) result once the watermark closes every window."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark.workloads import _events

    events = _events(spark, sf_dir).select("ts", "event_type", "value")
    batch = {
        (str(r.window_start), r.event_type): (r.n_events, r.sum_value)
        for r in windowed_event_counts(events).collect()
    }

    src = tmp_path / "wde_in"
    src.mkdir()
    events.coalesce(1).write.parquet(str(src / "b1"))
    # far-future row pushes the watermark past every real window's end;
    # its own window never finalizes, so it cannot appear in the output
    (
        spark.createDataFrame(
            [("2030-01-01 00:00:00", "flush", 0.0)],
            ["ts_s", "event_type", "value"],
        )
        .select(F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value")
        .coalesce(1)
        .write.parquet(str(src / "b2"))
    )
    out = str(tmp_path / "wde_out")
    q = (
        windowed_event_counts(
            stream_ingest_files(
                spark,
                str(src / "*"),
                "ts TIMESTAMP, event_type STRING, value DOUBLE",
                max_files_per_trigger=1,
            )
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "wde_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    if q.isActive:
        q.stop()
    stream = {
        (str(r.window_start), r.event_type): (r.n_events, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    assert stream == batch


def test_session_fn_pre_session_early_event_splits():
    """Processing-time mode, cross-batch out-of-order arrival: an event
    more than gap BEFORE the stored open session's start must close as
    its own session, not fold in via min(start, t) and produce a
    session spanning a gap larger than gap_ms (round-4 advisory)."""
    import pandas as pd

    from aws_sql_server_to_s3_datalake_etl_migration_spark.streaming.windows import (
        _session_fn,
    )

    class FakeState:
        hasTimedOut = False

        def __init__(self, value):
            self._v = value

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        def remove(self):
            self._v = None

        def setTimeoutDuration(self, ms):
            pass

    gap_ms = 2_000
    gap_us = gap_ms * 1000
    # stored open session: [100s, 101s], 3 events
    state = FakeState((100_000_000, 101_000_000, 3))
    # new batch: one event 10s (5 gaps) BEFORE the stored start
    early_us = 100_000_000 - 5 * gap_us
    batch = pd.DataFrame(
        {"ts": [pd.Timestamp(early_us, unit="us")]}
    )
    out = pd.concat(
        _session_fn((7,), [batch], state, gap_ms=gap_ms)
    )
    # the early event closed as a standalone session...
    assert len(out) == 1
    assert out.iloc[0]["n_events"] == 1
    assert out.iloc[0]["session_start"] == pd.Timestamp(early_us, unit="us")
    # ...and the stored session is still open, gap invariant intact
    assert state.get == (100_000_000, 101_000_000, 3)

    # sanity: an in-gap event still merges (no over-splitting)
    state2 = FakeState((100_000_000, 101_000_000, 3))
    near_us = 100_000_000 - gap_us // 2
    out2 = pd.concat(
        _session_fn(
            (7,),
            [pd.DataFrame({"ts": [pd.Timestamp(near_us, unit="us")]})],
            state2,
            gap_ms=gap_ms,
        )
    )
    assert len(out2) == 0
    assert state2.get == (near_us, 101_000_000, 4)


def test_stream_rollup_refresh_matches_batch(spark, tmp_path, sf_dir):
    """Differential: streaming continuous-aggregate maintenance (each
    micro-batch folded via incremental_rollup_refresh inside
    foreachBatch) must converge to the one-pass batch rollup — counts
    and exact-decimal sums equal, HLL distinct estimates equal (sketch
    unions are order-insensitive)."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.rollup import (
        rollup_events,
        with_distinct_estimate,
    )
    from aws_sql_server_to_s3_datalake_etl_migration_spark.streaming import (
        stream_rollup_refresh,
    )
    from aws_sql_server_to_s3_datalake_etl_migration_spark.workloads import _events

    events = _events(spark, sf_dir).select("ts", "event_type", "value", "user_id")
    batch = {
        (str(r.bucket), r.event_type): (r.n_events, r.sum_value, r.n_distinct_est)
        for r in with_distinct_estimate(
            rollup_events(events, distinct_col="user_id")
        ).collect()
    }

    # three uneven source files -> three micro-batches
    src = tmp_path / "srr_in"
    src.mkdir()
    for i, cond in enumerate(
        ["event_id % 3 = 0", "event_id % 3 = 1", "event_id % 3 = 2"]
    ):
        events.where(F.expr(cond)).coalesce(1).write.parquet(
            str(src / f"b{i}")
        )
    # re-read split files so each stream batch carries the same rows
    split = spark.read.parquet(str(src / "*"))
    assert split.count() == events.count()

    rollup_path = str(tmp_path / "srr_rollup")
    q = stream_rollup_refresh(
        stream_ingest_files(
            spark,
            str(src / "*"),
            "ts TIMESTAMP, event_type STRING, value DOUBLE, user_id LONG",
            max_files_per_trigger=1,
        ),
        rollup_path,
        checkpoint=str(tmp_path / "srr_ckpt"),
        distinct_col="user_id",
    )
    q.awaitTermination(300)
    if q.isActive:
        q.stop()

    streamed = {
        (str(r.bucket), r.event_type): (r.n_events, r.sum_value, r.n_distinct_est)
        for r in with_distinct_estimate(
            spark.read.parquet(rollup_path)
        ).collect()
    }
    assert streamed == batch


def test_stream_enrich_scd2_as_of_event_time(spark, tmp_path):
    """SCD2 as-of enrichment: events pick up the dimension version
    valid at their event time — an event before the attribute change
    sees the old value even when processed after it."""
    import datetime as dt

    from aws_sql_server_to_s3_datalake_etl_migration_spark.streaming import (
        stream_enrich_scd2,
        stream_ingest_files,
    )

    t0 = dt.datetime(2024, 1, 1)
    t_change = dt.datetime(2024, 1, 10)
    history = spark.createDataFrame(
        [
            (1, "bronze", t0, t_change, False),
            (1, "gold", t_change, None, True),
            (2, "silver", t0, None, True),
        ],
        "cust_id long, tier string, valid_from timestamp, "
        "valid_to timestamp, is_current boolean",
    )
    src = tmp_path / "scd_in"
    src.mkdir()
    events = spark.createDataFrame(
        [
            (10, 1, dt.datetime(2024, 1, 5)),    # before change -> bronze
            (11, 1, dt.datetime(2024, 1, 15)),   # after change  -> gold
            (12, 2, dt.datetime(2024, 1, 20)),   # single-version -> silver
            (13, 9, dt.datetime(2024, 1, 2)),    # unknown key   -> null
        ],
        "event_id long, cust_id long, ts timestamp",
    )
    events.coalesce(1).write.parquet(str(src / "b1"))

    out = str(tmp_path / "scd_out")
    q = (
        stream_enrich_scd2(
            stream_ingest_files(
                spark, str(src / "*"),
                "event_id LONG, cust_id LONG, ts TIMESTAMP",
            ),
            history,
            keys=["cust_id"],
        )
        .select("event_id", "tier")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "scd_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    if q.isActive:
        q.stop()
    got = {r["event_id"]: r["tier"] for r in spark.read.parquet(out).collect()}
    assert got == {10: "bronze", 11: "gold", 12: "silver", 13: None}


def test_stream_dedup_to_lake_unbounded_horizon(spark, tmp_path):
    """foreachBatch fingerprint-index dedup: duplicate content
    arriving many batches apart (beyond any watermark horizon) is
    still rejected; unique content lands exactly once."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark.streaming import (
        stream_dedup_to_lake,
        stream_ingest_files,
    )

    src = tmp_path / "sd_in"
    src.mkdir()
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(
        [(10, "beta"), (11, "gamma")], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(src / "b2"))
    spark.createDataFrame(
        [(20, "alpha"), (21, "gamma"), (22, "delta")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(src / "b3"))

    lake = str(tmp_path / "sd_lake")
    q = stream_dedup_to_lake(
        stream_ingest_files(
            spark, str(src / "*"), "doc_id LONG, text STRING",
            max_files_per_trigger=1,
        ),
        lake_path=lake,
        index_path=str(tmp_path / "sd_idx"),
        checkpoint=str(tmp_path / "sd_ckpt"),
    )
    q.awaitTermination(300)
    if q.isActive:
        q.stop()
    got = {(r["doc_id"], r["text"])
           for r in spark.read.parquet(lake).collect()}
    assert got == {(1, "alpha"), (2, "beta"), (11, "gamma"), (22, "delta")}


def test_dedup_commit_batch_replay_after_partial_commit(spark, tmp_path):
    """Crash-injection for the fingerprint-index dedup sink: a batch
    that committed its LAKE partition but died before the INDEX
    partition must, on replay, land exactly the same admitted rows —
    not zero (the loss mode of append-index-first) and not double
    (the dup mode of plain append)."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.dedup import (
        dedup_against_index,
    )
    from aws_sql_server_to_s3_datalake_etl_migration_spark.sources.writers import (
        overwrite_batch_partition,
    )
    from aws_sql_server_to_s3_datalake_etl_migration_spark.streaming import (
        dedup_commit_batch,
    )

    lake, idx = str(tmp_path / "lake"), str(tmp_path / "idx")
    b0 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    )
    dedup_commit_batch(b0, lake, idx, 0)

    # batch 1: "crash" after the lake write, before the index write —
    # run only the first two steps of the protocol
    b1 = spark.createDataFrame(
        [(10, "beta"), (11, "gamma"), (12, "gamma")],
        "doc_id long, text string",
    )
    partial = dedup_against_index(
        spark, b1, idx, exclude_subdir="ingest_batch_id=1"
    )
    overwrite_batch_partition(partial.drop("content_fp"), lake, 1)
    # index partition 1 never written: simulated crash point

    # at-least-once source redelivers batch 1 → full protocol replay
    dedup_commit_batch(b1, lake, idx, 1)
    got = [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(lake).collect()
    ]
    assert sorted(got) == [(1, "alpha"), (2, "beta"), (11, "gamma")]
    # index consistent with the lake: one fingerprint per admitted row
    assert spark.read.parquet(idx).count() == 3

    # a later batch still dedups against everything admitted so far
    b2 = spark.createDataFrame(
        [(20, "gamma"), (21, "delta")], "doc_id long, text string"
    )
    dedup_commit_batch(b2, lake, idx, 2)
    got = {
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(lake).collect()
    }
    assert got == {(1, "alpha"), (2, "beta"), (11, "gamma"), (21, "delta")}


def test_rollup_refresh_replayed_batch_id_is_noop(spark, tmp_path, sf_dir):
    """Exactly-once folding: re-folding an already-committed batch id
    (the foreachBatch replay after a crash between swap and checkpoint
    commit) must not double-count."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.rollup import (
        incremental_rollup_refresh,
    )
    from aws_sql_server_to_s3_datalake_etl_migration_spark.workloads import _events

    events = _events(spark, sf_dir).select("ts", "event_type", "value")
    b0 = events.where(F.expr("event_id % 2 = 0"))
    b1 = events.where(F.expr("event_id % 2 = 1"))
    path = str(tmp_path / "rollup")

    incremental_rollup_refresh(spark, b0, path, batch_id=0)
    incremental_rollup_refresh(spark, b1, path, batch_id=1)
    snap = {
        (str(r["bucket"]), r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(path).collect()
    }

    # replay of batch 1 (and a stale replay of batch 0): both no-ops
    incremental_rollup_refresh(spark, b1, path, batch_id=1)
    incremental_rollup_refresh(spark, b0, path, batch_id=0)
    again = {
        (str(r["bucket"]), r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(path).collect()
    }
    assert again == snap

    # a genuinely new batch id still folds
    incremental_rollup_refresh(
        spark, b1.limit(0), path, batch_id=2
    )  # empty fold: values unchanged, marker advances
    from aws_sql_server_to_s3_datalake_etl_migration_spark.sources import fs

    assert fs.read_text_file(spark, path + "/_last_folded_batch") == "2"


def test_stream_cdc_matches_batch_apply_and_replay_noop(spark, tmp_path):
    """Streaming CDC replication folded batch-by-batch must equal the
    one-shot batch cdc_apply_changes over the whole feed (batches
    split in sequence order, as a CDC transport delivers them), and a
    replayed batch id must be a no-op."""
    import os
    import time

    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.incremental import (
        cdc_apply_changes,
    )
    from aws_sql_server_to_s3_datalake_etl_migration_spark.sources import fs
    from aws_sql_server_to_s3_datalake_etl_migration_spark.streaming.ingest import (
        cdc_fold_batch,
        stream_cdc_to_lake,
        stream_ingest_files,
    )

    ddl = "id long, v string, seq long, op string"
    feed = [
        # batch 0: initial inserts
        [(1, "a", 1, "I"), (2, "b", 1, "I"), (3, "c", 1, "I")],
        # batch 1: update 1, delete 2, insert 4
        [(1, "a2", 2, "U"), (2, None, 2, "D"), (4, "d", 2, "I")],
        # batch 2: delete 4, re-insert 2, update 1 again
        [(4, None, 3, "D"), (2, "b2", 3, "I"), (1, "a3", 3, "U")],
    ]
    src = tmp_path / "cdc_in"
    src.mkdir()
    for i, rows in enumerate(feed):
        d = str(src / f"b{i}")
        spark.createDataFrame(rows, ddl).coalesce(1).write.parquet(d)
        # pin ascending mtimes so the file source delivers in feed order
        # (CDC folds are order-sensitive across batches)
        t = time.time() - 100 + i
        for root, _, files in os.walk(d):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))

    table = str(tmp_path / "cdc_table")
    q = stream_cdc_to_lake(
        stream_ingest_files(
            spark, str(src / "*"), ddl, max_files_per_trigger=1
        ),
        table_path=table,
        checkpoint=str(tmp_path / "cdc_ckpt"),
        key_col="id",
    )
    q.awaitTermination(300)
    if q.isActive:
        q.stop()

    streamed = {
        (r["id"], r["v"]) for r in spark.read.parquet(table).collect()
    }
    all_changes = spark.createDataFrame(sum(feed, []), ddl)
    empty = spark.createDataFrame([], "id long, v string")
    batch = {
        (r["id"], r["v"])
        for r in cdc_apply_changes(empty, all_changes, "id").collect()
    }
    assert streamed == batch == {(1, "a3"), (2, "b2"), (3, "c")}

    # replay of the last committed batch id: marker makes it a no-op
    last = int(fs.read_text_file(spark, table + "/_last_applied_batch"))
    replay = spark.createDataFrame([(9, "X", 99, "I")], ddl)
    cdc_fold_batch(replay, table, last, key_col="id")
    again = {
        (r["id"], r["v"]) for r in spark.read.parquet(table).collect()
    }
    assert again == streamed  # the stale replay changed nothing
    # a genuinely new batch id still folds
    cdc_fold_batch(replay, table, last + 1, key_col="id")
    assert (9, "X") in {
        (r["id"], r["v"]) for r in spark.read.parquet(table).collect()
    }


def test_stream_robust_ingest_quarantine_and_dedup(spark, tmp_path):
    """Streaming hardened ingest: malformed records dead-letter per
    batch, duplicate content arriving batches apart is rejected by the
    fingerprint index, and everything commits as batch-id partition
    overwrites (exactly-once layout)."""
    import os
    import time

    from aws_sql_server_to_s3_datalake_etl_migration_spark.streaming import (
        stream_robust_ingest,
    )

    src = tmp_path / "rsi_in"
    src.mkdir()
    batches = [
        '{"doc_id": 1, "text": "alpha"}\ngarbage one\n'
        '{"doc_id": 2, "text": "beta"}\n',
        '{"doc_id": 10, "text": "beta"}\n'      # cross-batch dupe
        '{"doc_id": 11, "text": "gamma"}\n',
        'garbage two\n{"doc_id": 20, "text": "alpha"}\n'  # dupe + bad
        '{"doc_id": 21, "text": "delta"}\n',
    ]
    for i, content in enumerate(batches):
        f = src / f"b{i}.jsonl"
        f.write_text(content)
        t = time.time() - 100 + i
        os.utime(f, (t, t))

    lake = str(tmp_path / "rsi_lake")
    quarantine = str(tmp_path / "rsi_q")
    q = stream_robust_ingest(
        spark,
        str(src),
        "doc_id BIGINT, text STRING",
        lake_path=lake,
        quarantine_path=quarantine,
        index_path=str(tmp_path / "rsi_idx"),
        checkpoint=str(tmp_path / "rsi_ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    if q.isActive:
        q.stop()

    got = {
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(lake).collect()
    }
    assert got == {(1, "alpha"), (2, "beta"), (11, "gamma"), (21, "delta")}
    quarantined = sorted(
        r["_raw_record"]
        for r in spark.read.parquet(quarantine).collect()
        if r["_raw_record"] is not None
    )
    assert quarantined == ["garbage one", "garbage two"]
    # exactly-once layout: one lake partition per batch id
    lake_parts = sorted(
        d for d in os.listdir(lake) if d.startswith("ingest_batch_id=")
    )
    assert len(lake_parts) == 3


def test_stream_profile_refresh_matches_batch(spark, tmp_path, sf_dir):
    """Differential: streaming column-profile maintenance (micro-batch
    folds via incremental_profile_refresh inside foreachBatch) must
    converge to the one-pass batch profiler — row/null counts and
    typed min/max exactly equal, HLL distinct estimates within the
    sketch's error band of the exact counts."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.profile import (
        profile_columns,
        profile_report,
    )
    from aws_sql_server_to_s3_datalake_etl_migration_spark.streaming import (
        stream_ingest_files,
        stream_profile_refresh,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cols = ["o_orderkey", "o_totalprice", "o_orderstatus"]
    batch = {
        r.col_name: r for r in profile_columns(orders, cols).collect()
    }

    src = tmp_path / "spr_in"
    src.mkdir()
    for i, cond in enumerate(
        ["o_orderkey % 3 = 0", "o_orderkey % 3 = 1", "o_orderkey % 3 = 2"]
    ):
        orders.where(F.expr(cond)).coalesce(1).write.parquet(
            str(src / f"b{i}")
        )

    profile_path = str(tmp_path / "spr_profile")
    q = stream_profile_refresh(
        stream_ingest_files(
            spark, str(src / "*"), orders.schema, max_files_per_trigger=1
        ),
        profile_path,
        str(tmp_path / "spr_ckpt"),
        cols=cols,
    )
    q.awaitTermination(120)
    streamed = {
        r.col_name: r
        for r in profile_report(
            spark.read.parquet(profile_path), orders.schema, cols
        ).collect()
    }
    assert set(streamed) == set(batch)
    for c in cols:
        assert streamed[c].n_rows == batch[c].n_rows
        assert streamed[c].n_nulls == batch[c].n_nulls
        assert streamed[c].min_value == batch[c].min_value
        assert streamed[c].max_value == batch[c].max_value
        assert (
            abs(streamed[c].n_distinct_est - batch[c].n_distinct)
            <= 0.05 * batch[c].n_distinct + 2
        )


def test_stream_pq_index_matches_batch_and_replays_safely(
    spark, tmp_path
):
    """Differential: streaming PQ-index maintenance (frozen-codebook
    encode per micro-batch, per-batch-id partition overwrite) must
    yield exactly the codes the batch encoder produces for the same
    vectors — and a replayed batch id must replace, not duplicate."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators import (
        quantize,
    )
    from aws_sql_server_to_s3_datalake_etl_migration_spark.streaming import (
        pq_index_commit_batch,
        stream_ingest_files,
        stream_vectors_to_pq_index,
    )

    embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    boot = embs.where(F.col("vec_id") < 200)
    rest = embs.where(F.col("vec_id") >= 200)
    cb = quantize.fit_pq_codebook(boot, m=8, n_codes=16, iters=1)
    index_path = str(tmp_path / "pq_stream_index")
    quantize.write_pq_index(
        quantize.pq_encode(boot, cb, m=8), cb, index_path, dim=64, m=8
    )

    src = tmp_path / "pq_in"
    src.mkdir()
    rest.where(F.col("vec_id") < 350).coalesce(1).write.parquet(
        str(src / "b0")
    )
    rest.where(F.col("vec_id") >= 350).coalesce(1).write.parquet(
        str(src / "b1")
    )
    q = stream_vectors_to_pq_index(
        stream_ingest_files(
            spark, str(src / "*"), embs.schema, max_files_per_trigger=1
        ),
        index_path,
        str(tmp_path / "pq_ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)

    codes, _, _, _ = quantize.read_pq_index(spark, index_path)
    streamed = {
        r.vec_id: list(r.pq_codes) for r in codes.collect()
    }
    ref = {
        r.vec_id: list(r.pq_codes)
        for r in quantize.pq_encode(embs, cb, m=8).collect()
    }
    assert streamed == ref
    assert len(streamed) == embs.count()

    # replay: committing batch 0's data again under the same id
    # replaces its partition — same final state, no duplicates
    pq_index_commit_batch(
        rest.where(F.col("vec_id") < 350), index_path, 0
    )
    codes2, _, _, _ = quantize.read_pq_index(spark, index_path)
    again = {r.vec_id: list(r.pq_codes) for r in codes2.collect()}
    assert again == ref


def test_stream_span_scrub_matches_oneshot(spark, tmp_path, sf_dir):
    """Differential: streaming span scrub (index-backed foreachBatch)
    over ordered micro-batches equals the one-shot span_dedup of the
    whole corpus."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.dedup import (
        span_dedup,
    )
    from aws_sql_server_to_s3_datalake_etl_migration_spark.streaming import (
        stream_ingest_files,
        stream_span_scrub_to_lake,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    oneshot = {
        r.doc_id: (r.n_spans, r.n_kept, r.clean_text)
        for r in span_dedup(docs, n=4).collect()
    }

    src = tmp_path / "sss_in"
    src.mkdir()
    # ordered landing: batch files named so the file source picks them
    # up in doc_id order (streaming admission matches global
    # first-occurrence when batches arrive in corpus order)
    docs.where("doc_id < 250").coalesce(1).write.parquet(str(src / "b0"))
    docs.where("doc_id >= 250").coalesce(1).write.parquet(str(src / "b1"))
    lake = str(tmp_path / "sss_lake")
    index = str(tmp_path / "sss_index")
    q = stream_span_scrub_to_lake(
        stream_ingest_files(
            spark, str(src / "*"), docs.schema, max_files_per_trigger=1
        ),
        lake,
        index,
        str(tmp_path / "sss_ckpt"),
        n=4,
        available_now=True,
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: (r.n_spans, r.n_kept, r.clean_text)
        for r in spark.read.parquet(lake).collect()
    }
    assert got == oneshot


def test_stream_vector_ingest_bootstraps_and_appends(spark, tmp_path):
    """The streaming vector pipeline bootstraps the index on the first
    micro-batch, appends the second with the frozen codebook, and the
    final index equals the batch pipeline run over the same batches."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators import (
        quantize,
    )
    from aws_sql_server_to_s3_datalake_etl_migration_spark.streaming import (
        stream_ingest_files,
        stream_vector_ingest,
    )

    embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    src = tmp_path / "svi_in"
    src.mkdir()
    embs.where("vec_id < 250").coalesce(1).write.parquet(str(src / "b0"))
    embs.where("vec_id >= 250").coalesce(1).write.parquet(str(src / "b1"))
    index = str(tmp_path / "svi_index")
    q = stream_vector_ingest(
        stream_ingest_files(
            spark, str(src / "*"), embs.schema, max_files_per_trigger=1
        ),
        index,
        str(tmp_path / "svi_quar"),
        str(tmp_path / "svi_ckpt"),
        available_now=True,
    )
    q.awaitTermination(180)
    codes, cb, dim, m = quantize.read_pq_index(spark, index)
    assert codes.count() == 500
    # frozen-codebook property: streamed second-batch codes equal a
    # direct encode of those vectors with the index codebook
    direct = {
        r.vec_id: list(r.pq_codes)
        for r in quantize.pq_encode(
            embs.where("vec_id >= 250"), cb, dim=dim, m=m
        ).collect()
    }
    streamed = {
        r.vec_id: list(r.pq_codes)
        for r in codes.where("vec_id >= 250").collect()
    }
    assert streamed == direct


def test_stream_txn_append_sink_is_idempotent_across_checkpoints(
    spark, tmp_path
):
    """stream_txn_append_to_lake: the SINK's own txn high-water mark
    dedups re-delivered batches even when the Spark source checkpoint
    is lost — the failure plain foreachBatch parquet appends cannot
    survive. Run the same availableNow drain twice with a FRESH
    checkpoint the second time (batch ids restart at 0, every file
    re-delivers): row count must not change."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark.sources import (
        delta_log,
    )
    from aws_sql_server_to_s3_datalake_etl_migration_spark.sources.readers import (
        read_delta,
    )
    from aws_sql_server_to_s3_datalake_etl_migration_spark.streaming import (
        stream_txn_append_to_lake,
    )

    src = tmp_path / "txn_landing"
    src.mkdir()
    lake = str(tmp_path / "txn_lake")
    spark.range(0, 20).selectExpr("id AS pk").write.parquet(
        str(src / "b1")
    )
    q = stream_txn_append_to_lake(
        stream_ingest_files(spark, str(src / "*"), "pk BIGINT"),
        lake,
        str(tmp_path / "ckpt1"),
        app_id="ingest-orders",
    )
    q.awaitTermination(120)
    assert {r.pk for r in read_delta(spark, lake).collect()} == set(
        range(20)
    )
    marks = delta_log.latest_txn_versions(spark, lake)
    assert marks == {"ingest-orders": 0}
    # checkpoint lost: fresh drain re-delivers everything as batch 0
    q2 = stream_txn_append_to_lake(
        stream_ingest_files(spark, str(src / "*"), "pk BIGINT"),
        lake,
        str(tmp_path / "ckpt2"),
        app_id="ingest-orders",
    )
    q2.awaitTermination(120)
    assert read_delta(spark, lake).count() == 20  # no double-append
    # new file + the ORIGINAL checkpoint: only the new file lands,
    # as batch 1 under the same app id
    spark.range(20, 25).selectExpr("id AS pk").write.parquet(
        str(src / "b2")
    )
    q3 = stream_txn_append_to_lake(
        stream_ingest_files(spark, str(src / "*"), "pk BIGINT"),
        lake,
        str(tmp_path / "ckpt1"),
        app_id="ingest-orders",
    )
    q3.awaitTermination(120)
    assert {r.pk for r in read_delta(spark, lake).collect()} == set(
        range(25)
    )
    assert delta_log.latest_txn_versions(spark, lake) == {
        "ingest-orders": 1
    }


def test_stream_wap_publishes_green_quarantines_red(spark, tmp_path):
    """Streaming Write-Audit-Publish: batches that pass the audit
    publish exactly-once to the target; a failing batch diverts WHOLE
    to quarantine (a stream cannot raise), and the target never sees
    any of its rows."""
    import os
    import time

    from pyspark.sql import functions as F

    from aws_sql_server_to_s3_datalake_etl_migration_spark.sources.readers import (
        read_delta,
    )
    from aws_sql_server_to_s3_datalake_etl_migration_spark.streaming.ingest import (
        stream_wap_to_lake,
    )

    src = tmp_path / "wap_in"
    src.mkdir()
    batches = [
        '{"pk": 1, "v": 10.0}\n{"pk": 2, "v": 20.0}\n',
        '{"pk": 3, "v": -5.0}\n{"pk": 4, "v": 40.0}\n',  # red: v<=0
        '{"pk": 5, "v": 50.0}\n',
    ]
    for i, content in enumerate(batches):
        f = src / f"b{i}.jsonl"
        f.write_text(content)
        t = time.time() - 100 + i
        os.utime(f, (t, t))
    stream = (
        spark.readStream.schema("pk long, v double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    target = str(tmp_path / "wap_target")
    quarantine = str(tmp_path / "wap_q")
    q = stream_wap_to_lake(
        stream,
        target,
        str(tmp_path / "wap_staging"),
        quarantine,
        checkpoint=str(tmp_path / "wap_ckpt"),
        app_id="wap-test",
        row_rules={"v_positive": F.col("v") <= 0},
    )
    q.awaitTermination(300)
    if q.isActive:
        q.stop()
    got = {r["pk"] for r in read_delta(spark, target).collect()}
    assert got == {1, 2, 5}
    bad = {r["pk"] for r in read_delta(spark, quarantine).collect()}
    assert bad == {3, 4}


# ---------------------------------------------------------------------------
# Streaming drift monitor (round 11)
# ---------------------------------------------------------------------------


def _binned_ks_mirror(batch_vals, ref_vals, boundaries):
    """Pure-Python mirror of the binned integer-exact KS."""
    def binv(v):
        return sum(1 for x in boundaries if v > x)

    import collections

    bc = collections.Counter(binv(v) for v in batch_vals)
    rc = collections.Counter(binv(v) for v in ref_vals)
    nb, nr = sum(bc.values()), sum(rc.values())
    cb = cr = 0
    d = 0
    for b in sorted(set(bc) | set(rc)):
        cb += bc.get(b, 0)
        cr += rc.get(b, 0)
        d = max(d, abs(cb * nr - cr * nb))
    return nb, nr, d


def test_ks_drift_batch_matches_mirror(spark):
    from aws_sql_server_to_s3_datalake_etl_migration_spark.streaming import (
        bin_counts,
        ks_drift_batch,
    )

    boundaries = [10.0, 20.0, 30.0]
    ref_vals = [5.0, 12.0, 25.0, 31.0, 15.0]
    batch_vals = [35.0, 36.0, 22.0, None]
    ref = spark.createDataFrame(
        [(v,) for v in ref_vals], "value double"
    )
    batch = spark.createDataFrame(
        [(v,) for v in batch_vals], "value double"
    )
    row = ks_drift_batch(
        batch, bin_counts(ref, boundaries), boundaries
    ).collect()[0]
    nb, nr, d = _binned_ks_mirror(
        [v for v in batch_vals if v is not None], ref_vals, boundaries
    )
    assert (row.n_batch, row.n_ref, row.d_num) == (nb, nr, d)
    assert row.ks_d == d / (nb * nr)


def test_stream_drift_monitor_flags_shifted_batch(spark, tmp_path):
    from aws_sql_server_to_s3_datalake_etl_migration_spark.streaming import (
        bin_counts,
        stream_drift_monitor,
        stream_ingest_files,
    )

    boundaries = [25.0, 50.0, 75.0]
    # reference: uniform 0..99
    ref = spark.createDataFrame(
        [(float(i),) for i in range(100)], "value double"
    )
    ref_path = str(tmp_path / "ref_bins")
    bin_counts(ref, boundaries).write.parquet(ref_path)

    src = tmp_path / "drift_landing"
    src.mkdir()
    # batch 0: same distribution (no drift); batch 1: shifted +75
    (
        spark.createDataFrame(
            [(float(i),) for i in range(100)], "value double"
        )
        .coalesce(1)
        .write.parquet(str(src / "b0"))
    )
    (
        spark.createDataFrame(
            [(float(i + 75),) for i in range(100)], "value double"
        )
        .coalesce(1)
        .write.parquet(str(src / "b1"))
    )
    out = str(tmp_path / "drift_log")
    q = stream_drift_monitor(
        stream_ingest_files(
            spark, str(src / "*"), "value DOUBLE", max_files_per_trigger=1
        ),
        ref_path,
        boundaries,
        out,
        str(tmp_path / "drift_ckpt"),
        threshold=0.2,
    )
    q.awaitTermination(120)
    log = {r.batch_id: r for r in spark.read.parquet(out).collect()}
    assert len(log) == 2
    rows = sorted(log.values(), key=lambda r: r.d_num)
    same, shifted = rows[0], rows[1]
    # identical distribution: D = 0 exactly
    assert (same.n_batch, same.n_ref, same.d_num) == (100, 100, 0)
    assert same.drifted is False
    # +75 shift: mirror the expected statistic
    nb, nr, d = _binned_ks_mirror(
        [float(i + 75) for i in range(100)],
        [float(i) for i in range(100)],
        boundaries,
    )
    assert (shifted.n_batch, shifted.n_ref, shifted.d_num) == (nb, nr, d)
    assert shifted.drifted is True


def test_stream_cusum_monitor_accumulates_and_alarms(spark, tmp_path):
    """The streaming CUSUM fold across micro-batches must equal a
    pure-Python fold over the same batch sequence, including the
    zero-rows-for-a-key batch and the alarm threshold."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark.streaming import (
        stream_cusum_monitor,
        stream_ingest_files,
    )

    exp_path = str(tmp_path / "expected")
    spark.createDataFrame(
        [("a", 10), ("b", 10)], "event_type string, expected long"
    ).write.parquet(exp_path)

    src = tmp_path / "cusum_landing"
    src.mkdir()
    # batch 0: a=30 (S=20, alarm: 20 <= 2*10 -> no), b=10 (S=0)
    # batch 1: a=25 (S=35 > 20 -> ALARM), b absent (S=0)
    # batch 2: a=0 rows? a absent too: a S=25 > 20 -> ALARM persists
    # "c" has NO expectation row: expected defaults to 0, so its
    # traffic is pure excess — it must alarm on first sighting (batch
    # 1) and its state must survive the silent batch 2.
    batches = [
        [("a",)] * 30 + [("b",)] * 10,
        [("a",)] * 25 + [("c",)] * 4,
        [("b",)] * 3,
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            rows, "event_type string"
        ).coalesce(1).write.parquet(str(src / f"b{i}"))

    state = str(tmp_path / "cusum_state")
    q = stream_cusum_monitor(
        stream_ingest_files(
            spark,
            str(src / "*"),
            "event_type STRING",
            max_files_per_trigger=1,
        ),
        exp_path,
        state,
        str(tmp_path / "cusum_ckpt"),
    )
    q.awaitTermination(120)

    rows = {
        (r.batch_id, r.event_type): r
        for r in spark.read.parquet(state).collect()
    }
    # 2 exp-listed keys x 3 batches + the expectation-less "c" from
    # its first sighting onward (batches 1 and 2)
    assert len(rows) == 8

    # python fold ground truth
    def fold(seq, expected=10, tf=2):
        s = mx = al = 0
        out = []
        for n in seq:
            s = max(0, s + n - expected)
            mx = max(mx, s)
            alarm = s > tf * expected
            al += 1 if alarm else 0
            out.append((n, s, mx, al, alarm))
        return out

    want_a = fold([30, 25, 0])
    want_b = fold([10, 0, 3])
    for b, want in enumerate(want_a):
        r = rows[(b, "a")]
        assert (r.n_batch, r.s, r.max_cusum, r.n_alarms, r.alarm) == want
    for b, want in enumerate(want_b):
        r = rows[(b, "b")]
        assert (r.n_batch, r.s, r.max_cusum, r.n_alarms, r.alarm) == want
    # expectation-less key: expected=0 -> alarms immediately, state
    # (s/max/n_alarms) carried through the batch where it is silent
    want_c = fold([4, 0], expected=0)
    for b, want in zip((1, 2), want_c):
        r = rows[(b, "c")]
        assert r.expected == 0
        assert (r.n_batch, r.s, r.max_cusum, r.n_alarms, r.alarm) == want


def test_stream_bloom_decontaminate_drops_leaks(spark, tmp_path):
    """Planted leak docs (sharing 3-grams with the eval set) must be
    dropped; clean docs land; a doc with zero bloom hits never pays
    the exact join (soundness comes from the no-false-negative Bloom
    guarantee, asserted separately in test_r13_operators)."""
    from pyspark.sql import functions as SF

    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.dedup import (
        bloom_build_ngrams,
        word_shingles,
    )
    from aws_sql_server_to_s3_datalake_etl_migration_spark.streaming import (
        stream_bloom_decontaminate,
        stream_ingest_files,
    )

    ev = spark.createDataFrame(
        [(100, "the forbidden benchmark answer is forty two exactly")],
        "doc_id long, text string",
    )
    bloom_path = str(tmp_path / "bloom")
    bloom_build_ngrams(ev, n=3).write.parquet(bloom_path)
    grams_path = str(tmp_path / "eval_grams")
    ev.select(
        SF.explode(word_shingles("text", 3)).alias("gram")
    ).distinct().write.parquet(grams_path)

    src = tmp_path / "landing"
    src.mkdir()
    spark.createDataFrame(
        [
            (1, "completely unrelated sentence about gardening tools"),
            (2, "quiz says the forbidden benchmark answer is forty two"),
            (3, "another clean document discussing mountain weather"),
        ],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(src / "b0"))

    lake = str(tmp_path / "lake")
    q = stream_bloom_decontaminate(
        stream_ingest_files(
            spark, str(src / "*"), "doc_id LONG, text STRING"
        ),
        bloom_path,
        grams_path,
        lake,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    kept = {r.doc_id for r in spark.read.parquet(lake).collect()}
    assert kept == {1, 3}


def test_stream_cms_matches_batch_and_replay_is_noop(
    spark, tmp_path
):
    """The maintained sketch must equal the batch CMS over the union
    of all batches (cell-wise-addition merge law), and replaying an
    already-applied batch id must be a no-op (marker protocol)."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.textops import (
        cms_build_tokens,
    )
    from aws_sql_server_to_s3_datalake_etl_migration_spark.streaming import (
        cms_fold_batch,
        stream_cms_maintain,
        stream_ingest_files,
    )

    src = tmp_path / "landing"
    src.mkdir()
    b0 = spark.createDataFrame(
        [(0, "alpha beta alpha"), (1, "gamma beta")],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(2, "alpha delta delta epsilon")],
        "doc_id long, text string",
    )
    b0.coalesce(1).write.parquet(str(src / "b0"))
    b1.coalesce(1).write.parquet(str(src / "b1"))

    sketch_path = str(tmp_path / "sketch")
    q = stream_cms_maintain(
        stream_ingest_files(
            spark, str(src / "*"), "doc_id LONG, text STRING"
        ),
        sketch_path,
        str(tmp_path / "ckpt"),
        d=2,
        w=32,
    )
    q.awaitTermination(120)

    got = sorted(
        map(tuple, spark.read.parquet(sketch_path).collect())
    )
    want = sorted(
        map(
            tuple,
            cms_build_tokens(
                b0.unionByName(b1), d=2, w=32
            ).collect(),
        )
    )
    assert got == want

    # replaying the last APPLIED batch id must not double-fold
    # (the file source may pack both files into one micro-batch, so
    # read the id from the marker instead of assuming it)
    from aws_sql_server_to_s3_datalake_etl_migration_spark.sources import fs

    last = int(
        fs.read_text_file(spark, sketch_path + "/_last_applied_batch")
    )
    cms_fold_batch(b1, sketch_path, batch_id=last, d=2, w=32)
    again = sorted(
        map(tuple, spark.read.parquet(sketch_path).collect())
    )
    assert again == want
