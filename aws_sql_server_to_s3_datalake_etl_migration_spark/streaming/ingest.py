"""Streaming ingestion: the reference's high-watermark incremental load
(utils.py:212-246) re-expressed as Structured Streaming.

A batch watermark (``max(pk)`` then ``pk > max``) is exactly what a
file-source stream's checkpoint does continuously: each new file is
processed once, exactly-once into the sink. ``maxFilesPerTrigger``
bounds per-micro-batch volume (the knob that keeps a 100 TB backfill
from becoming one giant batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def stream_ingest_files(
    spark: SparkSession,
    source_dir: str,
    schema: StructType | str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a landing directory (the streaming
    analog of repeated incremental reads)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    if fmt == "csv":
        reader = reader.option("header", "true")
    return reader.load(source_dir)


def stream_append_to_lake(
    df: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
    partition_by: list[str] | None = None,
) -> StreamingQuery:
    """Exactly-once append into a parquet lake table. ``available_now``
    drains everything currently in the source then stops — the batch
    job shape; pass False for a continuously running ingest."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same key within
    the watermark horizon (``dropDuplicatesWithinWatermark``). The
    watermark bounds the dedup state — without it, key state grows
    forever on an unbounded stream. Use for at-least-once sources
    (Kafka replays, re-uploaded files) ahead of an append sink;
    duplicates farther apart than the horizon need the merge sink
    (``stream_merge_to_lake``) instead."""
    return df.withWatermark(ts_col, watermark_delay)\
        .dropDuplicatesWithinWatermark(key_cols)


def stream_txn_append_to_lake(
    df: DataFrame,
    path: str,
    checkpoint: str,
    app_id: str,
    available_now: bool = True,
    partition_by: list[str] | None = None,
) -> StreamingQuery:
    """Exactly-once append into a LOG-BACKED Delta table
    (``sources/delta_log.py``) — the streaming analog of Delta's
    txnAppId/txnVersion writer options. Each micro-batch commits with
    a ``txn`` action ``(app_id, batch_id)``; on restart, foreachBatch
    may re-deliver a batch whose commit already landed (the Spark
    checkpoint records delivery, not the sink's durability), and the
    sink's own txn high-water mark skips it instead of double-
    appending. This makes the SINK idempotent independently of the
    source checkpoint — the property plain parquet appends via
    foreachBatch cannot give.

    ``app_id`` must be stable across restarts (a query name, not a
    run id) and unique per logical stream writing to this table."""
    from ..sources.delta_log import append_commit

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        append_commit(
            batch_df,
            path,
            partition_by=partition_by,
            txn_app_id=app_id,
            txn_version=int(batch_id),
        )

    writer = (
        df.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_merge_to_lake(
    df: DataFrame,
    path: str,
    checkpoint: str,
    primary_key: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming MERGE upsert: each micro-batch is merge-upserted into
    the lake table on ``primary_key`` via ``foreachBatch`` — the
    streaming form of the reference's incremental-updates mode
    (``utils.py:222-230``). Exactly-once per batch id under the
    checkpoint; late re-deliveries of the same key overwrite (SCD-0),
    so the sink is idempotent where plain append would duplicate.
    """
    from ..operators.incremental import merge_upsert
    from ..sources.writers import write_parquet

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            spark.read.parquet(path).schema  # does the table exist yet?
        except Exception:
            write_parquet(batch_df, path, mode="overwrite")
            return
        merge_upsert(spark, batch_df, path, primary_key)

    writer = (
        df.writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_commit_batch(
    batch_df: DataFrame,
    lake_path: str,
    index_path: str,
    batch_id: int,
    content_cols: list[str] | None = None,
    id_col: str = "doc_id",
) -> None:
    """One micro-batch of the fingerprint-index dedup sink — the unit
    ``stream_dedup_to_lake`` runs per foreachBatch invocation, exposed
    so crash/replay behavior is directly testable.

    Commit protocol (exactly-once under at-least-once replay):

    1. admit = batch deduped within itself, anti-joined against the
       index EXCLUDING this batch's own partition (so a replay after a
       partial commit sees exactly the pre-batch index state and
       recomputes the identical admitted set — the within-batch
       survivor rule is deterministic min-id);
    2. overwrite ``<lake>/ingest_batch_id=<id>/`` with the admitted
       rows;
    3. overwrite ``<index>/ingest_batch_id=<id>/`` with their
       fingerprints.

    Both writes target directories determined by the batch id alone,
    so any replay replaces its own partitions byte-for-byte instead of
    appending duplicates; a crash between 2 and 3 replays into the
    same overwrites with no loss (the failure mode the old
    append-index-first ordering had was a replayed batch anti-joining
    itself away against its own fingerprints — silent data loss).
    """
    from ..operators.dedup import dedup_against_index
    from ..sources.writers import overwrite_batch_partition

    admitted = dedup_against_index(
        batch_df.sparkSession,
        batch_df,
        index_path,
        content_cols=content_cols,
        id_col=id_col,
        exclude_subdir=f"ingest_batch_id={batch_id}",
    )
    overwrite_batch_partition(
        admitted.drop("content_fp"), lake_path, batch_id
    )
    overwrite_batch_partition(
        admitted.select("content_fp"), index_path, batch_id
    )


def stream_dedup_to_lake(
    df: DataFrame,
    lake_path: str,
    index_path: str,
    checkpoint: str,
    content_cols: list[str] | None = None,
    id_col: str = "doc_id",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming exact-content dedup with UNBOUNDED horizon: each
    micro-batch runs ``dedup_commit_batch`` against the persisted
    fingerprint index inside ``foreachBatch``, and only
    never-before-seen content lands in the lake.

    Complements ``stream_dedup``: the watermark version bounds state
    but forgets duplicates older than the horizon; this one remembers
    every fingerprint ever admitted (index grows with DISTINCT
    content, not stream length) at the cost of an index anti-join per
    batch.

    EXACTLY-ONCE under at-least-once replay: foreachBatch can re-run a
    batch after a crash, so neither the lake nor the index is plain
    ``append``-ed — both commit as deterministic partition overwrites
    keyed by the stream's batch id
    (``<path>/ingest_batch_id=<batch_id>/``), and the admission
    anti-join reads the index EXCLUDING the batch's own partition.
    A replay therefore recomputes the identical admitted set (the
    pre-batch index state is reconstructed exactly) and overwrites the
    same two directories instead of double-appending or — the failure
    the naive append-index-first ordering had — anti-joining its own
    half-committed fingerprints away and silently dropping the batch.
    Readers of ``lake_path`` see ``ingest_batch_id`` as an ordinary
    ingest-lineage partition column. Single writer per lake/index pair
    (one streaming query), which the checkpoint already implies."""

    def dedup_batch(batch_df: DataFrame, batch_id: int) -> None:
        dedup_commit_batch(
            batch_df, lake_path, index_path, batch_id,
            content_cols=content_cols, id_col=id_col,
        )

    writer = (
        df.writeStream.foreachBatch(dedup_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_rollup_refresh(
    df: DataFrame,
    rollup_path: str,
    checkpoint: str,
    bucket: str = "hour",
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    distinct_col: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming continuous-aggregate maintenance: each micro-batch is
    folded into the time-bucketed rollup table via
    ``incremental_rollup_refresh`` (operators/rollup.py) inside
    ``foreachBatch`` — COUNT/SUM add, HLL sketches union, so the
    refresh touches O(|batch| + |rollup|) aggregated rows regardless of
    stream history. Folding is exactly-once under at-least-once
    replay: the batch id is passed into ``incremental_rollup_refresh``,
    which commits it atomically WITH the fold (a sidecar riding the
    swap rename) and makes a replayed, already-folded id a no-op — the
    checkpoint alone cannot guarantee this, since foreachBatch may
    re-run a batch whose fold committed but whose checkpoint offset
    didn't. The result is the streaming twin of the batch rollup over
    the union of all batches (pinned by the stream-vs-batch
    differential in tests/test_streaming.py)."""
    from ..operators.rollup import incremental_rollup_refresh

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        incremental_rollup_refresh(
            batch_df.sparkSession,
            batch_df,
            rollup_path,
            bucket=bucket,
            ts_col=ts_col,
            key_cols=key_cols,
            value_col=value_col,
            distinct_col=distinct_col,
            batch_id=batch_id,
        )

    writer = (
        df.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to a
    stream (the streaming analog of the flagship job's fact-to-dim
    joins, ``table_jobs/nis_policies.py:24-25``).

    The static side is re-read per micro-batch, so dimension updates
    between batches are picked up without restarting the query. Spark
    plans this as a broadcast of the static side into each batch —
    no state store, no watermark needed (unlike stream-stream joins).
    Inner and left-outer are the supported shapes for stream-static;
    the stream side can't be the null-filled side."""
    return stream.join(dim, on=on, how=how)


def stream_enrich_scd2(
    stream: DataFrame,
    history: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """As-of enrichment against an SCD2 dimension history
    (operators/scd.py): each event joins the version whose validity
    interval covers its event time — late-arriving events pick up the
    attributes that were true WHEN THEY HAPPENED, not today's row,
    which is the correctness property plain ``stream_enrich`` against
    a current-only dimension cannot give.

    Still a stream-static join (re-read + broadcast per micro-batch,
    no state store): the interval predicate rides the same broadcast
    hash join on the business keys, and validity intervals are
    non-overlapping per key by SCD2 construction, so each event
    matches at most one version."""
    key_cond = [stream[k] == history[k] for k in keys]
    interval = (stream[ts_col] >= history[from_col]) & (
        history[to_col].isNull() | (stream[ts_col] < history[to_col])
    )
    cond = key_cond[0]
    for c in key_cond[1:]:
        cond = cond & c
    joined = stream.join(history, cond & interval, how)
    drop = [history[k] for k in keys]
    return joined.drop(*drop)


def cdc_fold_batch(
    batch_df: DataFrame,
    table_path: str,
    batch_id: int,
    key_col: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> None:
    """One micro-batch of the CDC replication sink — exposed (like
    ``dedup_commit_batch``) so crash/replay behavior is directly
    testable. Applies the batch's change events onto the snapshot at
    ``table_path`` via ``cdc_apply_changes`` and atomically swaps the
    result in, with the batch id riding the swap as a
    ``_last_applied_batch`` sidecar: a replayed, already-applied id is
    a no-op, so folds are exactly-once under at-least-once delivery
    (same marker protocol as the rollup refresh — the checkpoint alone
    can't give this, since foreachBatch may re-run a batch whose swap
    committed but whose offset didn't)."""
    from ..operators.incremental import cdc_apply_changes
    from ..sources import fs
    from ..sources.writers import swap_overwrite, write_parquet

    spark = batch_df.sparkSession
    marker = f"{table_path.rstrip('/')}/_last_applied_batch"
    last = fs.read_text_file(spark, marker)
    if last is not None and int(last) >= batch_id:
        return
    payload = [c for c in batch_df.columns if c not in (seq_col, op_col)]
    if not fs.path_exists(spark, table_path):
        # bootstrap: the first batch's surviving upserts ARE the table
        empty = batch_df.select(*payload).limit(0)
        write_parquet(empty, table_path, mode="overwrite")
    snapshot = spark.read.parquet(table_path).select(*payload)
    applied = cdc_apply_changes(
        snapshot, batch_df, key_col, seq_col=seq_col, op_col=op_col
    )
    swap_overwrite(
        applied, table_path,
        sidecar={"_last_applied_batch": str(batch_id)},
    )


def stream_cdc_to_lake(
    df: DataFrame,
    table_path: str,
    checkpoint: str,
    key_col: str,
    seq_col: str = "seq",
    op_col: str = "op",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming CDC replication: a change-event stream (insert /
    update / delete rows tagged with a monotonic sequence) continuously
    folded onto a lake snapshot — the streaming twin of the
    reference's incremental-updates mode extended to hard deletes.
    Each micro-batch runs ``cdc_fold_batch``: latest-sequence-wins
    apply + atomic swap + batch-id sidecar, so the materialized table
    equals the batch ``cdc_apply_changes`` over the union of all
    batches (pinned by the stream-vs-batch differential pytest) and
    replays never double-apply. Sequence numbers order changes ACROSS
    batches too: a late-arriving lower-sequence change for a key
    already updated by a later batch... loses, as it must — but only
    within what each fold can see; feed batches in source commit
    order (which a CDC transport provides) for full cross-batch
    ordering. Single writer per table path."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        cdc_fold_batch(
            batch_df, table_path, batch_id,
            key_col=key_col, seq_col=seq_col, op_col=op_col,
        )

    writer = (
        df.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_robust_ingest(
    spark: SparkSession,
    source_dir: str,
    ddl: str,
    lake_path: str,
    quarantine_path: str,
    index_path: str,
    checkpoint: str,
    fmt: str = "json",
    content_cols: list[str] | None = None,
    id_col: str = "doc_id",
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """The hardened ingest pipeline as one continuously-running
    stream — the streaming twin of ``pipelines.robust_ingest_to_lake``
    with the same per-batch guarantees:

    1. PERMISSIVE scan with dead-letter capture: malformed JSON/CSV
       records keep their raw text instead of crashing the query or
       becoming silent nulls;
    2. bad rows overwrite ``<quarantine>/ingest_batch_id=<id>/``;
    3. clean rows run the fingerprint-index dedup commit
       (``dedup_commit_batch``) — batch-unique, history-unique, lake
       and index committed as partition overwrites.

    Every write is a deterministic partition overwrite keyed by the
    stream's batch id, so the whole pipeline is exactly-once under
    at-least-once replay (same argument as ``stream_dedup_to_lake``;
    quarantine rows re-derive deterministically from the batch).
    Single writer per lake/index/quarantine triple.
    """
    from ..sources.writers import overwrite_batch_partition

    if fmt not in ("json", "csv"):
        raise ValueError(f"robust ingest supports json/csv, got {fmt!r}")
    reader = (
        spark.readStream.schema(ddl + ", _raw_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_raw_record")
    )
    if max_files_per_trigger:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    if fmt == "csv":
        reader = reader.option("header", "true")
    stream = reader.format(fmt).load(source_dir)

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        # _is_bad derives immediately so filters never reference the
        # corrupt column alone (the parser-pushdown restriction)
        tagged = batch_df.withColumn(
            "_is_bad", F.col("_raw_record").isNotNull()
        )
        bad = tagged.where(F.col("_is_bad")).drop("_is_bad")
        overwrite_batch_partition(bad, quarantine_path, batch_id)
        clean = tagged.where(~F.col("_is_bad")).drop(
            "_raw_record", "_is_bad"
        )
        dedup_commit_batch(
            clean, lake_path, index_path, batch_id,
            content_cols=content_cols, id_col=id_col,
        )

    writer = (
        stream.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_profile_refresh(
    df: DataFrame,
    profile_path: str,
    checkpoint: str,
    cols: list[str] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming column-profile maintenance: each micro-batch folds
    into the persisted wide-partial profile via
    ``incremental_profile_refresh`` (operators/profile.py) — counts
    sum, typed min/max fold, HLL distinct sketches union, so the
    refresh is O(|batch| + one state row) regardless of stream
    history. Exactly-once under at-least-once replay by the same
    contract as ``stream_rollup_refresh``: the batch id commits
    atomically with the fold (sidecar riding the swap rename), so a
    replayed, already-folded id is a no-op. Render the result with
    ``profile_report``; the streaming profile over the union of all
    batches equals the batch profiler's output (pinned by the
    differential in tests/test_streaming.py)."""
    from ..operators.profile import incremental_profile_refresh

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        incremental_profile_refresh(
            batch_df.sparkSession,
            batch_df,
            profile_path,
            cols=cols,
            batch_id=batch_id,
        )

    writer = (
        df.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def pq_index_commit_batch(
    batch_df: DataFrame,
    index_path: str,
    batch_id: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """One micro-batch of the streaming PQ-index maintainer: encode
    the batch's vectors with the index's FROZEN codebook
    (``operators.quantize.read_pq_index`` / ``pq_encode``) and
    overwrite ``<index>/codes/ingest_batch_id=<id>/``. The
    deterministic per-batch target makes replay exactly-once (a
    replayed batch re-encodes to the identical codes — the codebook is
    frozen — and replaces its own partition byte-for-byte); history is
    never re-read or re-encoded."""
    from ..operators.quantize import pq_encode, read_pq_index
    from ..sources.writers import overwrite_batch_partition

    _, cb, dim, m = read_pq_index(batch_df.sparkSession, index_path)
    enc = pq_encode(
        batch_df, cb, id_col=id_col, vec_col=vec_col, dim=dim, m=m
    )
    overwrite_batch_partition(enc, f"{index_path}/codes", batch_id)


def stream_vectors_to_pq_index(
    df: DataFrame,
    index_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = False,
):
    """Maintain a persisted PQ index from a vector stream: per
    micro-batch frozen-codebook encode + idempotent per-batch-id
    partition overwrite (``pq_index_commit_batch``). The index must
    exist (``quantize.write_pq_index``) — bootstrap fit, then stream
    appends; watch ``pq_index_drift`` on a schedule to decide refits.
    Streaming union of all batches equals the batch
    ``append_to_pq_index`` result (differential in
    tests/test_streaming.py)."""

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        pq_index_commit_batch(
            batch_df, index_path, batch_id, id_col=id_col,
            vec_col=vec_col,
        )

    writer = (
        df.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_span_scrub_to_lake(
    df: DataFrame,
    lake_path: str,
    index_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    available_now: bool = False,
):
    """Streaming duplicated-span removal: each micro-batch is scrubbed
    against the persisted span-fingerprint index
    (``operators.dedup.span_scrub_against_index``), cleaned docs land
    in ``<lake>/ingest_batch_id=<id>``, the batch's new span
    fingerprints in ``<index>/ingest_batch_id=<id>`` — both
    deterministic per-batch targets, and the admission compute
    excludes the batch's own index partition, so an at-least-once
    replay rewrites both partitions byte-for-byte (exactly-once
    semantics with plain parquet, the same protocol as
    ``stream_dedup_to_lake``). State is the index, not stream state —
    the dedup horizon is unbounded while the streaming state store
    stays empty."""
    from ..operators.dedup import span_scrub_against_index
    from ..sources.writers import overwrite_batch_partition

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        cleaned, new_fps = span_scrub_against_index(
            batch_df.sparkSession,
            batch_df,
            index_path,
            id_col=id_col,
            text_col=text_col,
            n=n,
            exclude_subdir=f"ingest_batch_id={batch_id}",
        )
        overwrite_batch_partition(cleaned, lake_path, batch_id)
        overwrite_batch_partition(new_fps, index_path, batch_id)

    writer = (
        df.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_vector_ingest(
    df: DataFrame,
    index_path: str,
    quarantine_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    n_codes: int = 16,
    available_now: bool = False,
):
    """Streaming twin of ``pipelines.vector_ingest_to_index``: each
    micro-batch runs the full gate → bootstrap-or-append → drift
    pipeline with ``run_id = batch_id``, so every write is a
    deterministic per-batch partition overwrite and replay is
    exactly-once (the first batch bootstraps the codebook; replaying
    it re-fits on identical data — the k-means seed order is the
    deterministic smallest-id sample — and rewrites the same
    partitions)."""
    from ..pipelines import vector_ingest_to_index

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        vector_ingest_to_index(
            batch_df.sparkSession,
            batch_df,
            index_path,
            quarantine_path,
            run_id=str(batch_id),
            id_col=id_col,
            vec_col=vec_col,
            dim=dim,
            m=m,
            n_codes=n_codes,
        )

    writer = (
        df.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_wap_to_lake(
    df: DataFrame,
    path: str,
    staging_root: str,
    quarantine_path: str,
    checkpoint: str,
    app_id: str,
    row_rules=None,
    unique_rules=None,
    available_now: bool = True,
    partition_by: list[str] | None = None,
) -> StreamingQuery:
    """Streaming Write-Audit-Publish (operators/wap.py per
    micro-batch): each batch stages durably, audits, and either
    PUBLISHES to ``path`` or DIVERTS whole to ``quarantine_path`` —
    a stream cannot raise on a bad batch, so rejection becomes data
    an operator replays after fixing the rule or the source.

    Exactly-once on BOTH sinks: publish and quarantine append with
    ``txn`` keys (one app id per stream and sink, batch id as the
    version — bounded txn state), and each ATTEMPT stages fresh so a
    crash mid-cycle can never accumulate duplicate rows into the
    snapshot that eventually publishes."""
    from ..operators.wap import WapRejected, wap_run
    from ..sources.delta_log import append_commit
    from ..sources.readers import read_delta

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        try:
            wap_run(
                batch_df.sparkSession,
                batch_df,
                path,
                staging_root,
                wap_id=f"{app_id}-b{batch_id}",
                row_rules=row_rules,
                unique_rules=unique_rules,
                partition_by=partition_by,
                txn_app_id=f"wap-{app_id}",
                txn_version=int(batch_id),
                fresh_staging=True,
            )
        except WapRejected as rej:
            spark = batch_df.sparkSession
            append_commit(
                read_delta(spark, rej.staging_path),
                quarantine_path,
                partition_by=partition_by,
                txn_app_id=f"wapq-{app_id}",
                txn_version=int(batch_id),
            )

    writer = (
        df.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Streaming distribution-drift monitor (round 11)
# ---------------------------------------------------------------------------


def bin_counts(
    df: DataFrame, boundaries: list[float], value_col: str = "value"
) -> DataFrame:
    """Histogram a value column into the fixed bins defined by sorted
    ``boundaries`` — bin id = number of boundaries strictly below the
    value (0 .. len(boundaries)), NULLs dropped. Returns
    ``(bin bigint, c bigint)``; empty bins are absent (consumers
    outer-join). The bin id is a codegen'd sum of bounded indicator
    terms — no UDF, no lookup join — so at 100 TB the histogram is
    one map-side-combined hash-agg over the scan."""
    bs = sorted(float(x) for x in boundaries)
    if not bs:
        raise ValueError("boundaries must be non-empty")
    bin_id = None
    for x in bs:
        term = F.when(F.col(value_col) > F.lit(x), 1).otherwise(0)
        bin_id = term if bin_id is None else bin_id + term
    return (
        df.where(F.col(value_col).isNotNull())
        .select(bin_id.cast("bigint").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def ks_drift_batch(
    batch_df: DataFrame,
    ref_bins: DataFrame,
    boundaries: list[float],
    value_col: str = "value",
) -> DataFrame:
    """Binned two-sample KS statistic between one batch and a
    reference histogram (``bin_counts`` output). Returns ONE row:
    ``(n_batch, n_ref, d_num, ks_d)``.

    The batch-side ECDF and the reference ECDF are compared at the
    shared bin boundaries — with FIXED bins the statistic is exact
    for the binned distributions and every quantity is integer until
    the final division (``d_num = max|c_b·n_r − c_r·n_b|`` over
    bigint cumulative counts, the ``events_ks_drift`` discipline), so
    replaying the same batch reproduces the same row bit-for-bit.
    The cumulative window runs over ≤ |boundaries|+1 rows — bounded
    by construction, the allowlisted carry shape."""
    from pyspark.sql.window import Window

    b = bin_counts(batch_df, boundaries, value_col).select(
        "bin", F.col("c").alias("b_c")
    )
    r = ref_bins.select("bin", F.col("c").alias("r_c"))
    grid = (
        b.join(r, "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("b_c", F.lit(0)).alias("b_c"),
            F.coalesce("r_c", F.lit(0)).alias("r_c"),
        )
    )
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = grid.select(
        F.sum("b_c").over(w).alias("cb"),
        F.sum("r_c").over(w).alias("cr"),
    )
    tot = cum.agg(
        F.coalesce(F.max("cb"), F.lit(0)).cast("bigint").alias("n_batch"),
        F.coalesce(F.max("cr"), F.lit(0)).cast("bigint").alias("n_ref"),
    )
    # totals ride a 1-row broadcast back over the <= |bins|+1 grid
    # rows; a both-sides-empty comparison yields zero rows (no data
    # to compare), which the monitor writes through as-is
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n_batch", "n_ref")
        .agg(
            F.max(
                F.abs(
                    F.col("cb") * F.col("n_ref")
                    - F.col("cr") * F.col("n_batch")
                )
            ).cast("bigint").alias("d_num")
        )
        .select(
            "n_batch",
            "n_ref",
            "d_num",
            F.when(
                (F.col("n_batch") == 0) | (F.col("n_ref") == 0),
                F.lit(None).cast("double"),
            )
            .otherwise(
                F.col("d_num").cast("double")
                / (
                    F.col("n_batch").cast("double")
                    * F.col("n_ref").cast("double")
                )
            )
            .alias("ks_d"),
        )
    )


def stream_drift_monitor(
    stream: DataFrame,
    ref_bins_path: str,
    boundaries: list[float],
    out_path: str,
    checkpoint: str,
    value_col: str = "value",
    threshold: float = 0.2,
    available_now: bool = True,
) -> StreamingQuery:
    """Per-micro-batch distribution-drift gate: each batch's binned
    KS statistic against the reference histogram at ``ref_bins_path``
    (re-read per batch, so a refreshed reference is picked up without
    a restart) is appended to the drift log at ``out_path`` with the
    ``drifted`` flag (ks_d > threshold) a downstream WAP gate or
    alert reads.

    Exactly-once under at-least-once foreachBatch replay: each
    batch's single row lands via DYNAMIC PARTITION OVERWRITE of its
    own ``batch_id=N`` partition — a replayed batch rewrites the same
    partition with the same deterministic row (``ks_drift_batch`` is
    integer-exact), never appends a duplicate. This is the engine's
    established idempotent-sink pattern (exactly-once partition
    overwrites, SCALING.md)."""

    def score_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        ref = spark.read.parquet(ref_bins_path)
        row = ks_drift_batch(
            batch_df, ref, boundaries, value_col
        ).select(
            F.lit(batch_id).cast("bigint").alias("batch_id"),
            "n_batch",
            "n_ref",
            "d_num",
            "ks_d",
            (F.col("ks_d") > F.lit(float(threshold))).alias("drifted"),
        )
        (
            row.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_path)
        )

    writer = (
        stream.writeStream.foreachBatch(score_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_cusum_monitor(
    stream: DataFrame,
    expected_path: str,
    state_path: str,
    checkpoint: str,
    key_col: str = "event_type",
    threshold_factor: int = 2,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming one-sided CUSUM control chart — the sequential twin
    of the batch ``events_cusum_alarm``: per key (e.g. event type),
    the running statistic S = max(0, S + (n_batch − expected))
    accumulates each micro-batch's excess over the expected per-batch
    rate (read from ``expected_path``: rows of ``(key, expected)``,
    integers), alarming when S crosses ``threshold_factor ×
    expected``. The monitored key domain is the UNION of the
    expectation table and the batch: a key with no expectation row
    defaults to ``expected = 0`` — every event for it is excess, so a
    brand-new event type alarms on first sighting rather than being
    dropped. Emits one state row per key per batch to ``state_path``
    partitioned by ``batch_id``.

    CUSUM state is SEQUENTIAL — batch N's state is a function of
    batch N−1's — so unlike the stateless drift monitor this folds
    across batches: each invocation reads the PREVIOUS batch's state
    partition (absent → zero state, including for keys first seen
    now), combines it with the current batch's per-key counts, and
    lands the new state via dynamic partition overwrite of its own
    ``batch_id=N`` partition. Exactly-once under at-least-once
    foreachBatch replay holds because the fold is DETERMINISTIC:
    a replayed batch re-reads the same N−1 state and the same batch
    rows, recomputes the identical state N, and overwrites the same
    partition — never double-applies (the engine's incremental-rollup
    replay-guard pattern). All state fields are exact int64 (counts
    and integer expectations; no float ever enters the fold).

    Scale shape: one per-key hash-agg on the micro-batch, one
    |keys|-row state join (broadcast), one |keys|-row write — state
    size tracks the key domain, never the stream."""

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        exp = spark.read.parquet(expected_path).select(
            F.col(key_col), F.col("expected").cast("bigint")
        )
        counts = (
            batch_df.groupBy(key_col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_batch"))
        )
        try:
            prev = (
                spark.read.parquet(state_path)
                .where(F.col("batch_id") == batch_id - 1)
                .select(
                    key_col,
                    F.col("s").alias("_ps"),
                    F.col("max_cusum").alias("_pmx"),
                    F.col("n_alarms").alias("_pal"),
                )
            )
        except Exception:  # first batch: no state table yet
            prev = spark.createDataFrame(
                [],
                f"{key_col} string, _ps long, _pmx long, _pal long",
            )
        # FULL OUTER: every key in the expectation table keeps state
        # alive even through a batch with zero rows for it (its
        # deviation is -expected, which can only lower S — but
        # max/alarms persist), AND a key first seen in this batch with
        # no expectation row enters state with expected=0 — all of its
        # traffic is excess, so it alarms from its first sighting
        # instead of being silently dropped.
        # prev joins full-outer as well: an expectation-less key's
        # accumulated S / max / alarm counters survive a batch in
        # which it goes silent (exp-listed keys were already kept
        # alive by the exp side).
        merged = (
            exp.join(counts, key_col, "full_outer")
            .join(prev, key_col, "full_outer")
            .select(
                key_col,
                F.lit(batch_id).cast("bigint").alias("batch_id"),
                F.coalesce("n_batch", F.lit(0)).alias("n_batch"),
                F.coalesce("expected", F.lit(0))
                .cast("bigint")
                .alias("expected"),
                F.coalesce("_ps", F.lit(0)).alias("_ps"),
                F.coalesce("_pmx", F.lit(0)).alias("_pmx"),
                F.coalesce("_pal", F.lit(0)).alias("_pal"),
            )
        )
        s_new = F.greatest(
            F.lit(0).cast("bigint"),
            F.col("_ps")
            + F.coalesce("n_batch", F.lit(0))
            - F.col("expected"),
        )
        out = merged.select(
            key_col,
            "batch_id",
            "n_batch",
            "expected",
            s_new.alias("s"),
            F.greatest(F.col("_pmx"), s_new).alias("max_cusum"),
            (
                F.col("_pal")
                + F.when(
                    s_new > F.lit(int(threshold_factor))
                    * F.col("expected"),
                    1,
                ).otherwise(0)
            ).cast("bigint").alias("n_alarms"),
            (
                s_new > F.lit(int(threshold_factor)) * F.col("expected")
            ).alias("alarm"),
        )
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(state_path)
        )

    writer = (
        stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_bloom_decontaminate(
    df: DataFrame,
    bloom_path: str,
    eval_grams_path: str,
    lake_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    available_now: bool = True,
):
    """Streaming decontamination with the Bloom prefilter in front of
    the exact check — the batch ``doc_bloom_prefilter`` shape run
    per micro-batch: the persisted filter words
    (``operators.dedup.bloom_build_ngrams`` output at ``bloom_path``)
    broadcast into every batch, each incoming doc's n-grams probe the
    filter locally, and ONLY docs with ≥1 bloom hit pay the exact
    join against the true eval gram set (``eval_grams_path``, column
    ``gram``). Clean docs (no true hit) land in
    ``<lake>/ingest_batch_id=<id>``; contaminated ones are dropped.
    The Bloom no-false-negative guarantee makes the shortcut sound:
    a doc with zero bloom hits provably has zero true hits, so
    skipping its exact join cannot leak contamination through.

    Exactly-once under at-least-once foreachBatch replay: the filter
    and eval set are immutable inputs, the scrub is deterministic,
    and each batch overwrites its own deterministic partition —
    byte-identical on replay (the ``stream_dedup_to_lake``
    protocol).

    Scale shape: the m/32-row filter is the ONLY thing broadcast —
    constant-size however large the eval suite grows — and the
    per-batch exact-join left side shrinks to the bloom survivors."""
    from ..operators.dedup import bloom_probe_ngrams
    from ..sources.writers import overwrite_batch_partition

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bloom = spark.read.parquet(bloom_path)
        ev = spark.read.parquet(eval_grams_path).select("gram")
        probed = bloom_probe_ngrams(
            batch_df, bloom, ev, id_col=id_col, text_col=text_col, n=n
        )
        contaminated = probed.where(F.col("true_hits") > 0).select(
            id_col
        )
        clean = batch_df.join(contaminated, id_col, "left_anti")
        overwrite_batch_partition(clean, lake_path, batch_id)

    writer = (
        df.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def cms_fold_batch(
    batch_df: DataFrame,
    sketch_path: str,
    batch_id: int,
    text_col: str = "text",
    d: int | None = None,
    w: int | None = None,
) -> None:
    """One micro-batch of the streaming count-min maintenance — the
    frequency-sketch sibling of ``cdc_fold_batch``, exposed so
    crash/replay behavior is directly testable. The batch's own CMS
    cells (``textops.cms_build_tokens``) fold into the persisted
    sketch by CELL-WISE ADDITION — the CMS merge law, so the
    maintained sketch is bit-identical to one built over the union of
    all batches (pinned by the stream-vs-batch differential pytest).
    The fold touches O(d·w) rows however long the stream ran — the
    sketch never grows, the 100 TB property that motivates CMS over
    exact counters in the first place.

    Exactly-once under at-least-once foreachBatch replay: the batch
    id rides the atomic swap as a ``_last_applied_batch`` sidecar and
    an already-applied id is a no-op (the cdc/rollup marker protocol
    — the checkpoint alone cannot give this)."""
    from ..operators import textops
    from ..sources import fs
    from ..sources.writers import swap_overwrite, write_parquet

    d = d if d is not None else textops.CMS_D
    w = w if w is not None else textops.CMS_W
    spark = batch_df.sparkSession
    marker = f"{sketch_path.rstrip('/')}/_last_applied_batch"
    last = fs.read_text_file(spark, marker)
    if last is not None and int(last) >= batch_id:
        return
    batch_cells = textops.cms_build_tokens(
        batch_df, text_col=text_col, d=d, w=w
    )
    if not fs.path_exists(spark, sketch_path):
        write_parquet(
            batch_cells.limit(0), sketch_path, mode="overwrite"
        )
    prior = spark.read.parquet(sketch_path)
    merged = (
        prior.unionByName(batch_cells)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    swap_overwrite(
        merged,
        sketch_path,
        sidecar={"_last_applied_batch": str(batch_id)},
    )


def stream_cms_maintain(
    df: DataFrame,
    sketch_path: str,
    checkpoint: str,
    text_col: str = "text",
    d: int | None = None,
    w: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming count-min sketch maintenance: a document stream
    continuously folded into a persisted ≤ d·w-cell frequency sketch
    via ``cms_fold_batch`` (cell-wise addition + atomic swap +
    batch-id sidecar). Point queries against the maintained sketch
    (``textops.cms_estimate``) serve token-frequency estimates at any
    moment without rescanning stream history. Single writer per
    sketch path."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        cms_fold_batch(
            batch_df,
            sketch_path,
            batch_id,
            text_col=text_col,
            d=d,
            w=w,
        )

    writer = (
        df.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
