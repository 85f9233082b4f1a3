"""Superlinearity probe for the text/dedup/events family.

Builds a K×-scaled copy of the sf0.1 documents / events / embeddings
tables (ids remapped per copy; document text perturbed with a
copy-specific token so the scaled corpus doesn't degenerate into
artificial exact-duplicate triples), runs the doc/event/emb extended
queries at 1× and K×, and prints per-query scaling ratios. A
linear-work query should land near K; candidate-pair generators may
run hotter (pair count grows with genuine near-dup density) but must
stay far from K² — that's the superlinear surprise this probe exists
to catch before a real cluster does.

Usage: python tools/bench_scaling.py [K]   (default 3)
Output: one JSON line {"scale": K, "queries": {name: {"t1": s,
"tk": s, "ratio": r}}}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_sql_server_to_s3_datalake_etl_migration_spark import workloads
from aws_sql_server_to_s3_datalake_etl_migration_spark.session import (
    default_parallelism,
    get_spark,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ITERATIONS = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))

SCALED = (
    "documents", "events", "embeddings", "customer", "orders", "lineitem"
)
COPIED = (
    "region nation supplier part"
).split()

QUERIES = [
    "doc_token_stats",
    "doc_exact_dedup",
    "doc_ngram_jaccard_pairs",
    "doc_repetition_stats",
    "doc_stratified_sample",
    "doc_tfidf_topterms",
    "doc_prep_pipeline",
    "events_rollup_incremental",
    "events_hourly_counts",
    "emb_label_centroids",
    "emb_cosine_topk",
    # round-5 additions: the Arrow-batched sketch (Python-side cost
    # must scale linearly with the corpus), the dense-grid family
    # (grid size is time-range-bound, not corpus-bound), and the
    # chunk-carry lateness profile
    "doc_frequent_terms_sketch",
    "events_gapfill_locf",
    "events_lateness_profile",
    "events_rolling_active_users",
    # round-6 additions (per the r5 verdict): the heavy round-5 ops
    # that had no 3x ratio yet — cross-batch incremental dedup
    # (per-batch cost must track batch size, not history), the batch
    # ANN join (cell-key equi-join, never corpus x queries), and
    # SemDeDup (within-cell pairs only)
    "doc_incremental_dedup",
    "emb_ivf_topk_batch",
    "emb_semantic_dedup",
    # round-6 curation additions: the deletion-neighborhood linkage
    # join (candidate count must track true pair density, never n²),
    # the gram-key postings self-join behind the source-overlap
    # matrix, query-term-filtered BM25, and the single-window
    # transition matrix
    "customer_name_neardup_pairs",
    "doc_source_overlap",
    "doc_bm25_search",
    "event_transition_matrix",
    # round-6 late additions: span-stats hash-agg + reassembly (must
    # track corpus size), bigram LM fluency (O(corpus tokens)), the
    # explode-based epoch materializer, and PQ encode+ADC (O(n·m·k)
    # encode, broadcast-lookup search)
    "doc_span_dedup",
    "doc_lm_fluency",
    "doc_epoch_mix",
    "emb_pq_topk",
    # binned interval join: pair count tracks true overlap density
    # (sessions x busy hours), never sessions x incidents
    "session_incident_overlap",
    # round-7 additions (per the r6 verdict item 6): the heavy
    # round-6 families with no recorded ratio yet — the batch-ANN
    # hard-negative miner (bounded query batch vs growing corpus),
    # multi-query BM25 (each doc term scored once), the one-scan
    # Expand profile over the now-scaled orders table, CDC apply
    # (feed and snapshot both scale; latest-wins anti-join), and the
    # strided-window substring-leak join (k-char window equi-join)
    "emb_hard_negatives",
    "doc_bm25_batch",
    "orders_column_profile",
    "orders_cdc_apply",
    "doc_substring_leak",
    # round-7 late addition: the fallback Delta engine's merge commit
    # (snapshot anti-join + copy-on-write file rewrite must track
    # table size)
    "orders_delta_merge_roundtrip",
    # round-8 (r7 verdict item 3): the production-shaped partial-probe
    # hard-negative miner — per-anchor work is nprobe/n_cells of the
    # corpus, so its ratio must sit well under the full-probe twin's
    "emb_hard_negatives_probed",
    # round-8 additions: the Arrow-batched zlib pass (Python-side cost
    # must track corpus bytes linearly) and the basket pair generator
    # (pair volume tracks Σ C(basket,2), never n²)
    "doc_compression_ratio",
    "part_pair_affinity",
    # round-8 late additions: the skyline pre-filter (exact-pass input
    # must track frontier band size, never the table), the prefix-dim
    # recall gauge (bounded query batch vs growing corpus — same
    # contract as the ANN families), session path mining (one window
    # chain, WindowGroupLimit top-3), and label propagation (per-cell
    # kNN graph + per-round joins must track corpus size; the
    # iterative family's only superlinear risk is lineage growth,
    # which persist-per-round caps)
    "orders_skyline",
    "emb_matryoshka_recall",
    "events_top_paths",
    "emb_label_propagation",
    # the user-keyed self-join behind the overlap matrix: pair volume
    # is Σ_user C(types_user, 2) — types are bounded, so growth must
    # track users, never events²
    "events_user_overlap",
    "events_cross_correlation",
    # round-8 post-close additions: the prefix-bounded characteristic-
    # term posting self-join (pair volume tracks shared-prefix
    # density, never docs²), the seven-edge anti-join RI audit (each
    # edge is one key-column shuffle over the scaled tables), the CDF
    # reconstruction (cost tracks the bytes the mutating commits
    # touched — here the whole scaled orders lake, so ~K), and the
    # stats-skipping scan (file pruning should hold the scan near the
    # matching range, so the ratio must sit WELL below K — this is
    # the one family where ~1 is the pass signal)
    "doc_tfidf_topterm_pairs",
    "referential_integrity_audit",
    "orders_delta_cdf",
    "orders_delta_stats_skipping_scan",
    # round-8 additions: boilerplate gram agg + broadcast membership
    # join (gram volume tracks corpus tokens), vocab-sized BPE pair
    # explode (Heaps'-law-sublinear vocab, ratio should sit BELOW K),
    # and the DSIR token-stream x vocab-ratio equi-join
    "doc_boilerplate_coverage",
    "doc_bpe_pair_counts",
    "doc_dsir_importance",
    # round-8 late additions (first ratios land in the round-9 probe):
    # CCNet buckets (lm_fluency machinery + per-language window),
    # lang-ID confusion (per-doc prediction agg), behavior outliers
    # (user-keyed agg + user-table-sized rank window), and the
    # partitioned-merge roundtrip (merge cost tracks table size)
    "doc_ccnet_buckets",
    "doc_langid_confusion",
    "events_user_behavior_outliers",
    "orders_delta_partitioned_merge_roundtrip",
    # round-9 (r8 verdict item 6): the heaviest extended query had no
    # probe entry — CDF-incremental view refresh (per-commit exceptAll
    # of added vs removed files; cost must track changed bytes, here
    # the whole scaled lake, so ~K)
    "orders_cdf_view_maintenance",
    # round-10 (r9 verdict item 3): the two remaining ordered-prefix
    # rewrites (same operator shape as the recorded outliers 0.80 —
    # the rows close SURVEY's "all three probe <= 1.05" claim with
    # artifacts), the iterative BPE learner (per-round cost must
    # track VOCAB growth — Heaps-sublinear — not corpus size), the
    # bucketed Theil-Sen pair generator (pair volume is calendar-
    # bounded: |hours| is unchanged at Kx data, so the ratio tracks
    # the hourly-rollup agg, ~K at most), the score-group AUC
    # (distinct-score collapse then ordered-prefix), and the WAP
    # cycle (stage + audit + publish all track batch size)
    "customer_rfm_segments",
    "customer_abc_classes",
    "doc_bpe_learn_merges",
    "events_theilsen_trend",
    "doc_quality_score_auc",
    "orders_wap_gated_publish",
    # round-10 in-round additions: the iterative PageRank loop (work
    # per round is O(edges), edges = 3x docs), the in-cell bigram /
    # 3-gram exploders (token-linear), the byte-level histogram twin
    # (corpus-byte-linear), the ordered-prefix Gini, the bucket-locate
    # exact percentiles (two passes, ~1/64 of each group sorted), and
    # the Pareto decile rollup
    "doc_pagerank_fixedpoint",
    "doc_collocation_lift",
    "doc_ngram_novelty_curve",
    "mm_byte_histogram_checked",
    "doc_source_gini",
    "orders_price_quantiles",
    "supplier_pareto_deciles",
    # r10 ordered-lead rewrite: the within-day bucketed lead must
    # track events linearly (the old plan's per-type-day task was the
    # ceiling; this one's tasks are per (type, day, day-slice))
    "events_time_weighted_avg",
    # r10 late additions: the embedding-drift posexplode pass (linear
    # in vectors) and the trigram-profile self-join (pair volume is
    # vocab-bounded — Heaps-sublinear — never corpus^2)
    "emb_batch_drift",
    "doc_lang_trigram_distance",
    # two bucket-locate passes; cost must track events linearly
    "events_robust_outliers",
    # round-11 additions: BPE learn+apply (both run on the distinct
    # vocabulary — Heaps-sublinear — plus one corpus-linear mapping
    # join), and the chain-graph WCC (rounds = diameter, fixed at 7
    # by construction; per-round work is O(edges) = O(docs))
    "doc_bpe_tokenize",
    "doc_link_components",
    # r11 warehouse additions: the fact-keyed bucket-locate median
    # (two passes over the orderkey join), the cohort/cadence pair
    # (per-customer agg + co-partitioned joins), and the fingerprint
    # dup-pressure rollup (all corpus/fact-linear by construction)
    "supplier_leadtime_median",
    "orders_cohort_ltv",
    "customer_interpurchase_stats",
    "doc_dup_rate_by_source",
    # global ordered-prefix Gini at |customers| cardinality — the
    # rank pass must stay fact-linear
    "customer_revenue_gini",
    # single-pass two-label bucket-locate over asset byte lengths
    "mm_size_profile",
    # Q21-shaped blame report: one orderkey fact-fact join + two
    # hash-aggs — pair work tracks lines, never lines^2
    "suppliers_kept_waiting",
    # r11 second batch: degree-ordered triangle counting (wedge work
    # is Σ C(outdeg,2); the synthetic graph's out-degrees are ≤2, so
    # edge-linear — the orientation is what keeps a hub-heavy real
    # graph at O(m^1.5) instead of deg_max^2), the KS drift test
    # (per-value hash-agg + ordered-prefix pass, value-linear), and
    # the block jackknife (one map-side-combined agg to 32 rows)
    "doc_link_triangles",
    "events_ks_drift",
    "orders_block_jackknife_ci",
    # per-key OLS: one hourly hash-agg over the stream, moments over
    # the |keys x hours| rollup — must track events linearly
    "events_ols_trend",
    # ER composition: deletion-key blocking + per-round O(edges) WCC
    # — pair volume tracks customers (bounded per-key neighborhoods)
    "customer_entity_resolution",
    # three order statistics from ONE bucket-locate pass — must track
    # the orders table linearly like the other locate callers
    "orders_median_ci",
    # three strictly-shrinking hash-aggs; ratio should sit at ~1
    # (group-count-bound, not row-bound)
    "customer_l_diversity",
    # k-core peeling: 8 cascade waves by construction (bucket-width-
    # bound, NOT corpus-bound), each wave O(edges) — must track edges
    # linearly with a fixed wave count
    "doc_link_kcore",
    # one fact-dim join + two shrinking aggs; fact-scan-bound
    "customer_target_encoding",
    # two fact scans (bounds + label) folded into 3-row aggs
    "events_embargo_split",
    # per-customer hash-agg + calendar-bounded rollup windows
    "customer_survival_km",
    # two fact scans folded to a 4-cell agg
    "events_diff_in_diff",
    # round-12 additions: the tokenizer tail (vocab fold + one
    # posexplode + ordered-prefix id rank — must track corpus
    # linearly), the h-index core decomposition (per-round O(edges)
    # with a cascade-depth-bound round count), the ordered-prefix
    # rank statistics (per-value agg + bucketed prefix), the
    # NTILE-based curves, and the winnowing index (per-doc array
    # codegen + fp equi-join whose pair count tracks true copy
    # density, never n²)
    "doc_bpe_token_ids",
    "doc_link_coreness",
    "events_mannwhitney_drift",
    "customer_decile_migration",
    "doc_ttr_curve",
    "doc_winnowing_pairs",
    "events_cusum_alarm",
    # round-13 additions: per-doc segmental TTR (token-linear array
    # codegen, no shuffle — ratio ~K at most), per-source hapax rollup
    # (vocab is Heaps-sublinear, ratio should sit BELOW K), the
    # containment pair generator (same fused-postings candidate class
    # as the Jaccard probe — pair volume tracks true duplication
    # density, never docs²), the winnowing span reporter (fp-join pair
    # volume + a (pair, diagonal)-keyed window over true matches), the
    # Bloom prefilter (gram-linear probe against a CONSTANT-size
    # filter; the exact join's left side is bloom survivors, so ratio
    # must track the gram stream), the two stream-linear drift/
    # concentration aggs, the basket rules rollup (same orderkey
    # self-join class as part_pair_affinity), and the two seeded
    # vector paths (corpus × n_cells assignment plus a probed-cell /
    # shortlist tail — corpus-linear). emb_semantic_dedup_cells is
    # deliberately NOT probed: it is a fixed-cell verification twin
    # (per-cell pair work is quadratic at FIXED n_cells by design;
    # the production entry scales n_cells with the corpus and carries
    # the probe).
    "doc_msttr",
    "doc_hapax_stats",
    "doc_ngram_containment_pairs",
    "doc_copy_spans",
    "doc_bloom_prefilter",
    "events_poisson_rate_shift",
    "events_hourly_concentration",
    "part_rules_lift",
    "emb_mmr_rerank",
    "emb_ivf_seeded_topk",
    "emb_ivf_seeded_topk_batch",
    # exact 2-hop ball sizes: wedge volume Σ deg² (triangle-count
    # budget class); out-degrees ≤ 2 on the synthetic graph, so the
    # ratio must track edges
    "doc_link_ball_sizes",
    # post-close additions: MASE rollup (fact-linear agg + calendar-
    # bounded self-join) and the blocking-quality meta-evaluation
    # (deletion-key equi-join tracks name-collision density — the
    # candidate volume IS the quantity the query reports)
    "orders_forecast_mase",
    "customer_blocking_quality",
    # emb_label_prop_cells is deliberately NOT probed: like
    # emb_semantic_dedup_cells it is a FIXED-cell verification twin
    # (per-cell pair work is quadratic at fixed n_cells by design —
    # measured 6.25 at 3x, exactly the 9x/3x arithmetic predicts);
    # the production entry scales n_cells with the corpus and
    # carries the probe (emb_label_propagation, 1.44).
    # ---- round 14 ----
    # NOTE incident join: both the incident count and each window's
    # event density scale with the data rate, so pair volume is
    # intrinsically ~x9 at x3 data — the blast-radius report's
    # semantics, same documented class as customer_blocking_quality
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


def build_scaled_dir(spark, k: int) -> str:
    # v4: lineitem joined the scaled set (basket pair-affinity probe;
    # l_orderkey remapped in sync with orders so joins stay
    # consistent) — new cache tag so stale caches are never reused
    dst = os.path.join(REPO_ROOT, ".lake_cache", f"scale_v4_x{k}")
    marker = os.path.join(dst, "_PREPPED")
    if os.path.exists(marker):
        return dst
    os.makedirs(dst, exist_ok=True)
    n_files = default_parallelism()
    for t in COPIED:
        src = f"{SF_DIR}/{t}.parquet"
        out = f"{dst}/{t}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, out, dirs_exist_ok=True)
        else:
            os.makedirs(out, exist_ok=True)
            shutil.copy(src, os.path.join(out, "part-00000.parquet"))
    for t in SCALED:
        df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        copies = []
        for c in range(k):
            off = 10_000_000 * c
            cp = df
            if t == "documents":
                cp = cp.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(off)
                )
                if c > 0:  # perturb so copies aren't exact dupes
                    cp = cp.withColumn(
                        "text",
                        F.concat(F.col("text"), F.lit(f" copytoken{c}")),
                    )
            elif t == "events":
                cp = cp.withColumn(
                    "event_id", F.col("event_id") + F.lit(off)
                ).withColumn("user_id", F.col("user_id") + F.lit(off))
            elif t == "orders":
                # key offset is a multiple of 8, so the CDC feed's
                # %2/%4/%8 key-derived update/delete pattern is
                # preserved verbatim in every copy; custkeys follow
                # the scaled customer copies
                cp = cp.withColumn(
                    "o_orderkey", F.col("o_orderkey") + F.lit(off)
                ).withColumn(
                    "o_custkey", F.col("o_custkey") + F.lit(off)
                )
            elif t == "lineitem":
                # follow the orders remap so l_orderkey keeps joining
                # its order copy; part keys stay — every copy repeats
                # the same baskets, so pair supports scale k-fold
                cp = cp.withColumn(
                    "l_orderkey", F.col("l_orderkey") + F.lit(off)
                )
            elif t == "customer":
                # remap key AND regenerate the name from it: copies get
                # genuinely new (unique) names whose near-dup density
                # to the base copy mirrors the in-copy density — the
                # honest load profile for the linkage join
                cp = cp.withColumn(
                    "c_custkey", F.col("c_custkey") + F.lit(off)
                ).withColumn(
                    "c_name",
                    F.format_string("Customer#%09d", F.col("c_custkey")),
                )
            else:
                cp = cp.withColumn(
                    "vec_id", F.col("vec_id") + F.lit(off)
                )
            copies.append(cp)
        out = copies[0]
        for cp in copies[1:]:
            out = out.unionByName(cp)
        out.repartition(n_files).write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
    with open(marker, "w") as f:
        f.write("ok")
    return dst


def time_queries(
    spark, qs, sf_dir: str, names: list[str] | None = None
) -> dict[str, float]:
    out = {}
    for name in names or QUERIES:
        best = None
        for _ in range(max(1, ITERATIONS)):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        out[name] = round(best, 3)
        print(f"# {os.path.basename(sf_dir)} {name}: {out[name]}s",
              file=sys.stderr)
    return out


def main() -> None:
    # usage: bench_scaling.py [K] [query ...] — names limit the run
    # to those families (for probing additions without a full sweep;
    # the per-round refresh still runs the whole list)
    argv = sys.argv[1:]
    k = int(argv[0]) if argv and argv[0].isdigit() else 3
    names = [a for a in argv if not a.isdigit()] or None
    for n in names or []:
        if n not in QUERIES:
            raise SystemExit(f"{n} is not a probe family")
    spark = get_spark(app_name="bench-scaling")
    qs = workloads.queries()
    scaled_dir = build_scaled_dir(spark, k)
    # 1x baseline re-split the same way so file layout isn't a variable
    base_dir = build_scaled_dir(spark, 1)
    t1 = time_queries(spark, qs, base_dir, names)
    tk = time_queries(spark, qs, scaled_dir, names)
    result = {
        "scale": k,
        "queries": {
            n: {
                "t1": t1[n],
                "tk": tk[n],
                "ratio": round(tk[n] / t1[n], 2) if t1[n] else None,
            }
            for n in (names or QUERIES)
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
