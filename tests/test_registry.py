"""Registry behavior: conf application per Spark application, catalog
ordering (the driver's correctness window is the first 50 entries)."""

from __future__ import annotations

from aws_sql_server_to_s3_datalake_etl_migration_spark import registry, workloads  # noqa: F401
from aws_sql_server_to_s3_datalake_etl_migration_spark.registry import (
    _CONFS_APPLIED,
    _PRIORITY,
    _ensure_engine_confs,
    oracles,
    queries,
)


def test_engine_confs_reapply_for_new_application(spark):
    """The conf cache keys by applicationId, so a session whose id
    isn't cached (fresh application, or a recreated session reusing a
    GC'd Python object id) gets the engine confs applied."""
    app_id = spark.sparkContext.applicationId
    # simulate a fresh application: evict the cache entry + perturb a
    # dynamic conf the engine sets
    _CONFS_APPLIED.discard(app_id)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    _ensure_engine_confs(spark)
    assert (
        spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
        == "true"
    )
    assert app_id in _CONFS_APPLIED
    # cache hit: confs are NOT re-applied on every query call
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    _ensure_engine_confs(spark)
    assert (
        spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
        == "false"
    )
    # restore for the rest of the suite
    _CONFS_APPLIED.discard(app_id)
    _ensure_engine_confs(spark)


def test_catalog_window_is_curated_and_oracled():
    qs = list(queries())
    assert len(qs) == len(set(qs))
    assert qs[: len(_PRIORITY)] == list(_PRIORITY)
    window = set(qs[:50])
    # every SURVEY §2 core representative + the LLM suite is in-window
    must_have = {
        # permanently-pinned §2 core
        "flagship_policies_ingest",
        "incremental_new_rows",
        "merge_upsert_preview",
        "recon_row_counts",
        "window_top_orders_per_segment",
        # soaking round-6/7 cohort representatives
        "customer_name_neardup_pairs",
        "doc_bm25_batch",
        "doc_span_dedup",
        "doc_pack_sequences",
        "orders_cdc_apply",
        "event_asof_enrich",
        "orders_column_profile",
        "emb_pq_topk",
        "emb_hard_negatives",
        "session_incident_overlap",
        "partitioned_orders_dpp_join",
        "bucketed_supplier_volume",
        "zorder_orders_skipping_scan",
        "doc_pii_scrub",
        # round-8 rotation: first-official-row cohort (r7 verdict 1)
        "doc_minhash_exact_dup_pairs",
        "doc_simhash_exact_dup_pairs",
        "doc_token_budget_mix",
        "emb_knn_classify",
        "events_change_points",
        "doc_phrase_search",
        "doc_length_winsorized",
        "order_lineitem_view_delta",
        "events_sliding_windows",
        "orders_delta_merge_roundtrip",
    }
    assert must_have <= window
    # the official window carries only oracle-paired entries (rows-only
    # checks are weaker signal and live outside it)
    os_ = oracles()
    assert all(n in os_ for n in qs[:50])
