"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Methodology (disclosed in the JSON):
- One-time lake prep (untimed, reported as ``prep_sec``): the source
  dir's big tables ship as single-file single-row-group parquet, which
  serializes every scan onto one task. A real deployment of this engine
  ingests into its own layout (that IS the flagship pipeline), so the
  bench does the same once per sf into ``.lake_cache/bench_<tag>``:
  big tables re-split into one file per core, small tables copied.
  Queries then run against that dir. Delete the cache dir to re-prep.
- Steady-state timing: each query runs ``ITERATIONS`` times and the
  minimum is reported (first runs pay JVM JIT + whole-stage-codegen
  compilation, which a long-lived cluster session pays once, not per
  query). ``value`` is the sum of per-query minimums. The default is 5
  iterations: round-4 analysis showed min-of-3 admits ~15% run-to-run
  noise on a shared machine (the same code measured 13.4s and 10.7s an
  hour apart at 3 vs 6 iters), which swamps real plan regressions.
- Host-load stamps (r11 verdict item 4): this machine is co-tenant —
  the r11 round recorded apparent per-query regressions that an
  idle-window re-run showed were load artifacts (driver extended total
  21% above the close reading). Every JSON now carries
  ``load_1m_start/_end`` (plus 5-min), and each query records the
  1-min load at its best iteration; queries whose best iteration still
  ran under load above ``SPARK_GRAFT_LOAD_WARN`` (default 2.0) are
  listed in ``load_flagged`` so round-over-round diffs can separate
  code drift from host noise without a re-run.
- SELF-load-aware flagging (r15, r14 verdict item 9): at 32 cores the
  bench's own stages push the 1-min load past the 2.0 threshold, so
  every query was flagged and the flag stopped discriminating. The
  bench now tracks its OWN process tree's CPU rate as a 1-minute EMA
  (same decay as /proc/loadavg) and flags on the EXTERNAL load
  estimate ``max(0, load_1m - self_ema)``; raw loads still ship in the
  sidecar (``query_load_1m``) next to the new ``query_ext_load_1m``.
- Consumption-boundary cache release (r15, r14 verdict items 1/5):
  every sweep-style query returns a persisted, materialized frame
  (the materialize-then-release pattern), so a full catalog pass used
  to leave one CacheManager entry per such query. After each timed
  iteration's ``count()`` the bench now calls
  ``spark.catalog.clearCache()`` — OUTSIDE the timed region — which
  keeps the CacheManager flat across the run and structurally forces
  every iteration to recompute from the parquet inputs (the
  no-cross-run-caching contract; previously enforced only by the
  operators' input-unpersist side effect, which is Spark-version-
  sensitive CacheManager behavior).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aws_sql_server_to_s3_datalake_etl_migration_spark import workloads
from aws_sql_server_to_s3_datalake_etl_migration_spark.session import (
    default_parallelism,
    get_spark,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ITERATIONS = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "5"))
LOAD_WARN = float(os.environ.get("SPARK_GRAFT_LOAD_WARN", "2.0"))
REPO_ROOT = os.path.dirname(os.path.abspath(__file__))


def _loadavg() -> tuple[float, float]:
    """(1-min, 5-min) load average; (-1, -1) where /proc is absent."""
    try:
        one, five = open("/proc/loadavg").read().split()[:2]
        return float(one), float(five)
    except (OSError, ValueError):
        return -1.0, -1.0


def _tree_cpu_seconds() -> float:
    """Total CPU seconds (user+sys) burned so far by this process and
    every live descendant (the py4j JVM and its Python workers) — the
    bench's own contribution to the host load. Exited children are not
    counted; the long-lived JVM carries virtually all of the CPU."""
    try:
        clk = float(os.sysconf("SC_CLK_TCK"))
        procs: dict[int, tuple[int, float]] = {}
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/stat", "rb") as fh:
                    data = fh.read().decode("ascii", "replace")
            except OSError:
                continue
            rp = data.rfind(")")
            fields = data[rp + 2:].split()
            # after comm: 0=state 1=ppid ... 11=utime 12=stime
            procs[int(pid)] = (
                int(fields[1]),
                (int(fields[11]) + int(fields[12])) / clk,
            )
        children: dict[int, list[int]] = {}
        for pid, (ppid, _) in procs.items():
            children.setdefault(ppid, []).append(pid)
        total, stack, seen = 0.0, [os.getpid()], set()
        while stack:
            p = stack.pop()
            if p in seen or p not in procs:
                continue
            seen.add(p)
            total += procs[p][1]
            stack.extend(children.get(p, []))
        return total
    except (OSError, ValueError, IndexError):
        return 0.0


class _SelfLoadEMA:
    """1-minute EMA of the bench's own CPU rate, mirroring the kernel's
    loadavg decay, so ``load_1m - ema`` estimates EXTERNAL load."""

    def __init__(self) -> None:
        self._t = time.time()
        self._cpu = _tree_cpu_seconds()
        self.ema = 0.0

    def sample(self) -> float:
        import math

        now, cpu = time.time(), _tree_cpu_seconds()
        dt = max(now - self._t, 1e-6)
        rate = max(0.0, (cpu - self._cpu) / dt)
        a = math.exp(-dt / 60.0)
        self.ema = self.ema * a + rate * (1.0 - a)
        self._t, self._cpu = now, cpu
        return self.ema

# Tables big enough that one-task scans dominate; everything else is
# copied as-is. documents/embeddings are row-light but compute-heavy
# (regex tokenization, shingling, vector math), so scan parallelism
# matters even more than for the fact tables.
RESPLIT = {"lineitem", "orders", "events", "documents", "embeddings"}
ALL_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

HEADLINE = [
    "flagship_policies_ingest",
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "returned_item_losses",
    "small_quantity_part_revenue",
    "nation_market_share",
    "disjunctive_filter_revenue",
    "outer_join_nation_order_stats",
    "window_top_orders_per_segment",
    "running_customer_spend",
    "topk_orders",
    "set_ops_customer_cohorts",
    "group_distinct_counts",
    "part_type_margins",
    "merge_upsert_preview",
    "incremental_new_rows",
    "events_scalar_functions",
    "recon_row_counts",
]

# Timed after the headline set, reported under "extended": the round-2
# surface (TPC-H gap-fill, warehouse maintenance, LLM prep).
EXTENDED = [
    "cheapest_part_offers",
    "product_type_profit",
    "priority_shipment_classes",
    "customer_order_distribution",
    "top_revenue_suppliers",
    "scd2_customer_history",
    "dq_orders_report",
    "doc_prep_pipeline",
    "doc_exact_dedup",
    "doc_ngram_jaccard_pairs",
    "doc_repetition_stats",
    "doc_stratified_sample",
    "doc_tfidf_topterms",
    "doc_decontamination",
    "doc_shuffle_shards",
    "doc_quality_prune",
    "doc_weighted_sample",
    "doc_temperature_mix",
    "doc_source_drift",
    "event_funnel_conversion",
    "event_retention_cohorts",
    "events_variant_props",
    "events_lateness_profile",
    "events_rolling_active_users",
    "events_gapfill_locf",
    "events_gapfill_interpolate",
    "events_anomaly_zscore",
    "doc_frequent_terms_sketch",
    "recon_snapshot_diff",
    "events_rollup_incremental",
    "emb_label_centroids",
    "emb_cosine_topk",
    # round-6 additions: temporal joins, CDC, curation, chunking
    "event_asof_enrich",
    "orders_cdc_apply",
    "doc_source_caps",
    "doc_chunks",
    "doc_take_n",
    "doc_pack_sequences",
    "doc_substring_leak",
    # round-6 curation suite: linkage, retrieval, profiling,
    # transitions, trend, quantized search
    "customer_name_neardup_pairs",
    "doc_bm25_search",
    "doc_bm25_batch",
    "doc_lm_fluency",
    "doc_span_dedup",
    "doc_epoch_mix",
    "event_transition_matrix",
    "doc_source_overlap",
    "orders_column_profile",
    "events_value_trend",
    "emb_quantized_topk",
    "emb_pq_topk",
    "emb_hard_negatives",
    "orders_price_quantiles",
    "customer_rfm_segments",
    "event_funnel_windowed",
    "scd2_customer_changes",
    "events_seasonal_baseline",
    "doc_corpus_card",
    "doc_oov_rate",
    "session_incident_overlap",
    "emb_quality_report",
    "zorder_orders_skipping_scan",
    "bucketed_supplier_volume",
    "events_salted_type_stats",
    "partitioned_orders_dpp_join",
    # round-7 additions: PII scrub, verified LSH twins, data-mix
    # allocation, kNN labels, change points, phrase search, robust
    # stats
    "doc_pii_scrub",
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
    # round-8 additions
    "orders_delta_partitioned_roundtrip",
    "emb_hard_negatives_probed",
    "doc_readability",
    "emb_dim_stats",
    "doc_compression_ratio",
    "events_hll_rollup",
    "events_time_weighted_avg",
    "customer_abc_classes",
    "events_ohlc_bars",
    "part_pair_affinity",
    # round-8 late additions: frontier/statistics/format families
    "orders_skyline",
    "supplier_nation_hhi",
    "lineitem_weighted_median",
    "events_acf_daily",
    "events_top_paths",
    "orders_benford_dq",
    "emb_matryoshka_recall",
    "orders_orc_roundtrip",
    "events_json_roundtrip",
    "customer_order_streaks",
    "events_cross_correlation",
    "events_value_histogram",
    "events_user_overlap",
    "orders_multiformat_union",
    "customer_pseudonymize",
    "events_ab_conversion_lift",
    # round-8 post-close: lake-engine suite + similarity/RI additions
    "orders_delta_update_delete_roundtrip",
    "orders_delta_compact_restore_roundtrip",
    "orders_delta_cdf",
    "orders_cdf_view_maintenance",
    "orders_delta_stats_skipping_scan",
    "orders_delta_schema_evolution",
    "doc_tfidf_topterm_pairs",
    "referential_integrity_audit",
    # round-8: shallow clone, boilerplate filter, BPE prep, DSIR
    "orders_delta_clone_divergence",
    "doc_boilerplate_coverage",
    "doc_bpe_pair_counts",
    "doc_dsir_importance",
    "doc_ccnet_buckets",
    "orders_delta_rename_roundtrip",
    "orders_delta_generated_month_scan",
    "orders_delta_partitioned_merge_roundtrip",
    "doc_langid_confusion",
    "events_user_behavior_outliers",
    # round-9 additions: exact AUC over score groups (distributed
    # ordered-prefix), k-anonymity audit, iterative BPE merge
    # learning, hybrid sparse+dense retrieval fusion
    "doc_quality_score_auc",
    "customer_k_anonymity",
    "doc_bpe_learn_merges",
    "doc_hybrid_rrf_search",
    "doc_leakage_free_split",
    "mm_integrity_screen",
    "mm_entropy_screen",
    "events_cumulative_reach",
    "doc_confusable_spam_groups",
    "orders_wap_gated_publish",
    "doc_quality_calibration",
    "events_theilsen_trend",
    # round-10 additions
    "orders_wap_red_path_audit",
    "mm_byte_histogram_checked",
    "doc_collocation_lift",
    "doc_ngram_novelty_curve",
    "doc_source_gini",
    "doc_pagerank_fixedpoint",
    "supplier_pareto_deciles",
    "doc_source_lang_chi2",
    "emb_batch_drift",
    "doc_lang_trigram_distance",
    "events_robust_outliers",
    # round-11 additions
    "doc_bpe_tokenize",
    "doc_link_components",
    "supplier_leadtime_median",
    "orders_cohort_ltv",
    "customer_interpurchase_stats",
    "orders_seasonality_index",
    "doc_dup_rate_by_source",
    "customer_revenue_gini",
    "part_brand_share_shift",
    "mm_size_profile",
    "order_priority_check",
    "suppliers_kept_waiting",
    "global_sales_opportunity",
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
    # round-12 additions
    "doc_bpe_token_ids",
    "doc_link_coreness",
    "events_mannwhitney_drift",
    "events_mann_kendall",
    "events_cusum_alarm",
    "lineitem_returnflag_anova",
    "orders_priority_status_cramers_v",
    "customer_decile_migration",
    "doc_simpson_diversity",
    "doc_ttr_curve",
    "orders_convert_to_delta_roundtrip",
    "doc_winnowing_pairs",
    "events_ewma_baseline",
    # round-13 additions
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
    "emb_ivf_seeded_topk_batch",
    "doc_link_ball_sizes",
    # round-13 post-close additions (no close reading this round)
    "orders_forecast_mase",
    "customer_blocking_quality",
    "emb_label_prop_cells",
    # round-14 additions
    "events_incident_window_join",
    "events_changepoint",
    "events_hll_explicit",
    "doc_cms_heavy_hitters",
    "orders_trailing_90d_spend",
    "events_mad_outliers",
    "doc_feature_hashing",
    "doc_bigram_collocations",
    "doc_link_clustering_coeff",
    "events_type_audience_overlap",
    "doc_personalized_pagerank",
    "customer_lateral_top2_orders",
]


def prepare_bench_lake(spark, sf_dir: str) -> tuple[str, float]:
    """Ingest the source tables into the bench lake layout once per sf:
    big tables re-split into one file per core (scan tasks = cores),
    small tables copied verbatim. Returns (bench_dir, prep_seconds);
    prep_seconds is 0.0 on a warm cache."""
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    dst = os.path.join(REPO_ROOT, ".lake_cache", f"bench_{tag}")
    marker = os.path.join(dst, "_PREPPED")
    if os.path.exists(marker):
        return dst, 0.0
    t0 = time.time()
    n_files = default_parallelism()
    os.makedirs(dst, exist_ok=True)
    for t in ALL_TABLES:
        src = f"{sf_dir}/{t}.parquet"
        out = f"{dst}/{t}.parquet"
        if t in RESPLIT:
            # events: whatever physical ts type this runtime reads
            # (bigint nanos on old Sparks honoring nanosAsLong,
            # timestamp_ntz on Spark >= 4.x) round-trips through the
            # re-split copy unchanged; workloads._events branches on
            # the observed dtype either way.
            df = spark.read.parquet(src)
            df.repartition(n_files).write.mode("overwrite").parquet(out)
        elif os.path.isdir(src):
            shutil.copytree(src, out, dirs_exist_ok=True)
        else:
            os.makedirs(out, exist_ok=True)
            shutil.copy(src, os.path.join(out, "part-00000.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return dst, round(time.time() - t0, 3)


def main() -> None:
    spark = get_spark(app_name="bench")
    qs = workloads.queries()
    try:
        bench_dir, prep_sec = prepare_bench_lake(spark, SF_DIR)
    except Exception as e:  # never let prep sink the bench
        print(f"# lake prep failed ({e}); using raw source dir",
              file=sys.stderr)
        bench_dir, prep_sec = SF_DIR, 0.0
    if prep_sec:
        print(f"# lake prep: {prep_sec}s (one-time)", file=sys.stderr)

    # Warm up the JVM + parquet footers once, untimed.
    try:
        qs["global_watermark_max"](spark, bench_dir).collect()
    except Exception as e:
        print(f"# warm-up failed ({e}); continuing", file=sys.stderr)

    errors: dict[str, str] = {}
    query_load: dict[str, float] = {}  # 1-min load at best iteration
    query_ext_load: dict[str, float] = {}  # load minus own-EMA, best it.
    load_start = _loadavg()
    self_load = _SelfLoadEMA()
    # the warm-up query above may have left a cache entry; start clean
    try:
        spark.catalog.clearCache()
    except Exception:
        pass

    def time_set(names: list[str], iters: int = ITERATIONS) -> dict[str, float]:
        # Per-query fault isolation: one broken query records an error
        # entry and the run keeps timing the rest — a bench that loses
        # all signal to a single failure masks every other regression.
        out: dict[str, float] = {}
        for name in names:
            if name not in qs:
                continue
            best, rows, best_load, best_ext = None, 0, -1.0, -1.0
            try:
                for _ in range(max(1, iters)):
                    load_now = _loadavg()[0]
                    ext_now = max(0.0, load_now - self_load.sample())
                    t0 = time.time()
                    rows = qs[name](spark, bench_dir).count()
                    elapsed = time.time() - t0
                    # consumption boundary (untimed): release the
                    # query's persisted result + any stragglers so
                    # the CacheManager stays flat and the next
                    # iteration provably recomputes from parquet
                    spark.catalog.clearCache()
                    if best is None or elapsed < best:
                        best, best_load = elapsed, load_now
                        best_ext = round(ext_now, 2)
            except Exception as e:
                errors[name] = f"{type(e).__name__}: {e}"[:300]
                print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
                continue
            out[name] = round(best, 3)
            query_load[name] = best_load
            query_ext_load[name] = best_ext
            flag = " [LOAD]" if best_ext > LOAD_WARN else ""
            print(
                f"# {name}: {out[name]}s ({rows} rows, "
                f"load {best_load}, ext {best_ext}){flag}",
                file=sys.stderr,
            )
        return out

    timings = time_set(HEADLINE)
    # The extended set runs at the same min-of-5 as the headline (r6
    # verdict item 3): at min-of-3 the sub-second extended queries
    # showed ±40-60% apparent round-over-round swings that were pure
    # scheduler noise, making regression tracking on the set
    # unreliable. SCALING.md documents the measured noise floor.
    extended = time_set(EXTENDED, iters=ITERATIONS)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    load_end = _loadavg()
    # flag on the EXTERNAL load estimate (r15): raw 1-min load at 32
    # cores is dominated by the bench's own stages (r14 flagged all
    # 228 queries), so subtract the bench's own-CPU EMA first
    flagged = sorted(
        n for n, ld in query_ext_load.items() if ld > LOAD_WARN
    )
    result = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "iterations": ITERATIONS,
        "prep_sec": prep_sec,
        # co-tenant host context (r11 verdict item 4): 1-min/5-min
        # load at sweep start/end; per-query loads in the sidecar
        "load_1m_start": load_start[0],
        "load_5m_start": load_start[1],
        "load_1m_end": load_end[0],
        "load_flagged_n": len(flagged),
        "load_flag_mode": "ext_rel_self_ema",
        # Round-2 additions, timed separately so "value" stays
        # comparable round-over-round on the same 19-query set.
        "extended_total": round(sum(extended.values()), 3),
        "extended_detail": "bench_extended.json",
    }
    if errors:
        result["errors"] = {k: v[:80] for k, v in errors.items()}
    # The per-query extended map (190+ entries, ~4 KB) goes to a
    # sidecar file + stderr, NOT the stdout JSON: BENCH_r08 recorded
    # "parsed": null because the driver's 2000-char tail capture
    # truncated the headline out of one giant line. The stdout
    # contract stays ONE JSON line — now compact enough that any tail
    # window sees it whole.
    full = dict(result)
    full["extended"] = extended
    full["query_load_1m"] = query_load
    full["query_ext_load_1m"] = query_ext_load
    full["load_flagged"] = flagged
    if errors:
        full["errors"] = errors
    try:
        with open(os.path.join(REPO_ROOT, "bench_extended.json"), "w") as f:
            json.dump(full, f, indent=1)
    except OSError as e:
        print(f"# could not write bench_extended.json: {e}", file=sys.stderr)
    print(f"# extended per-query: {json.dumps(extended)}", file=sys.stderr)
    print(
        f"# HEADLINE {result['value']}s EXTENDED "
        f"{result['extended_total']}s over {len(extended)} queries",
        file=sys.stderr,
    )
    line = json.dumps(result)
    if len(line) > 1900:  # belt-and-braces: never exceed a tail window
        result.pop("queries", None)
        result["queries_detail"] = "bench_extended.json"
        line = json.dumps(result)
    print(line)


if __name__ == "__main__":
    main()
