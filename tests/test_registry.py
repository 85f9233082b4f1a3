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
    # the permanently-pinned §2 anchors (r8 verdict item 1 shrank the
    # pin set to these six)
    anchors = {
        "flagship_policies_ingest",
        "global_watermark_max",
        "incremental_new_rows",
        "merge_upsert_preview",
        "recon_row_counts",
        "window_top_orders_per_segment",
    }
    assert anchors <= window
    # round-14 rotation contract (r13 verdict item 2): all 15 staged
    # round-13 candidates hold window slots
    r14_rotation = {
        "doc_copy_spans",
        "emb_semantic_dedup_cells",
        "doc_msttr",
        "doc_hapax_stats",
        "doc_ngram_containment_pairs",
        "doc_bloom_prefilter",
        "emb_mmr_rerank",
        "events_poisson_rate_shift",
        "events_hourly_concentration",
        "part_rules_lift",
        "emb_ivf_seeded_topk",
        "doc_link_ball_sizes",
        "orders_forecast_mase",
        "customer_blocking_quality",
        "emb_label_prop_cells",
    }
    assert r14_rotation <= window
    # round-13 rotation cohort (one official row so far — kept for a
    # second): the later-batch 12 round-11 additions and the 13
    # round-12 additions, plus the kept lake trio (MERGE roundtrip +
    # the CDF pair)
    r13_rotation = {
        "doc_link_triangles",
        "events_ks_drift",
        "orders_block_jackknife_ci",
        "customer_l_diversity",
        "events_ols_trend",
        "customer_entity_resolution",
        "orders_median_ci",
        "doc_link_kcore",
        "customer_target_encoding",
        "events_embargo_split",
        "customer_survival_km",
        "events_diff_in_diff",
        "doc_bpe_token_ids",
        "doc_link_coreness",
        "events_mannwhitney_drift",
        "events_mann_kendall",
        "events_cusum_alarm",
        "events_ewma_baseline",
        "lineitem_returnflag_anova",
        "orders_priority_status_cramers_v",
        "customer_decile_migration",
        "doc_simpson_diversity",
        "doc_ttr_curve",
        "orders_convert_to_delta_roundtrip",
        "doc_winnowing_pairs",
        "orders_delta_partitioned_merge_roundtrip",
        "orders_delta_cdf",
        "orders_cdf_view_maintenance",
    }
    assert r13_rotation <= window
    # the official window carries only oracle-paired entries (rows-only
    # checks are weaker signal and live outside it)
    os_ = oracles()
    assert all(n in os_ for n in qs[:50])
