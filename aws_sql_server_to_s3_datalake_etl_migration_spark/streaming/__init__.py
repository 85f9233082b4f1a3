"""Structured Streaming operators: the streaming analog of the
reference's batch incremental loads (SURVEY.md §2.7/§2.10) plus the
windowed/stateful operators a training-data pipeline needs."""

from .ingest import (
    cdc_fold_batch,
    dedup_commit_batch,
    stream_cdc_to_lake,
    stream_ingest_files,
    stream_append_to_lake,
    stream_txn_append_to_lake,
    stream_dedup,
    stream_dedup_to_lake,
    stream_enrich,
    stream_enrich_scd2,
    stream_merge_to_lake,
    pq_index_commit_batch,
    stream_profile_refresh,
    stream_span_scrub_to_lake,
    stream_vector_ingest,
    stream_vectors_to_pq_index,
    stream_robust_ingest,
    stream_rollup_refresh,
)
from .windows import windowed_event_counts, sessionize, stream_stream_join

__all__ = [
    "cdc_fold_batch",
    "stream_cdc_to_lake",
    "dedup_commit_batch",
    "stream_stream_join",
    "stream_rollup_refresh",
    "stream_ingest_files",
    "stream_append_to_lake",
    "stream_txn_append_to_lake",
    "stream_dedup",
    "stream_dedup_to_lake",
    "stream_enrich",
    "stream_enrich_scd2",
    "stream_merge_to_lake",
    "pq_index_commit_batch",
    "stream_profile_refresh",
    "stream_span_scrub_to_lake",
    "stream_vector_ingest",
    "stream_vectors_to_pq_index",
    "stream_robust_ingest",
    "windowed_event_counts",
    "sessionize",
]
