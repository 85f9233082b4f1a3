"""Skew stress for the dedup/LSH family: pathological corpora (one
stop-shingle in every doc, one hot LSH bucket) must keep candidate
counts bounded by the documented caps instead of going quadratic.

The caps' recall cost is also pinned here: pairs whose ONLY evidence
is a hot gram/bucket are lost — the documented trade (exact-dedup
first; hot grams are stop-words with no discriminative power).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_sql_server_to_s3_datalake_etl_migration_spark.operators import dedup

# a 12-word phrase shared by EVERY doc: its 10 interior 3-gram
# shingles have document frequency == corpus size (stop-shingles)
HOT_PHRASE = "the quick brown fox jumps over the lazy dog near the river"


def _pathological_corpus(spark, n_docs=1500, n_clusters=3, cluster_size=4):
    """Every doc contains HOT_PHRASE plus a unique tail; docs inside a
    cluster additionally share a distinctive 8-word tail."""
    rows = []
    for i in range(n_docs):
        cluster = i // cluster_size if i < n_clusters * cluster_size else -1
        if cluster >= 0:
            tail = (
                f"cluster {cluster} shares this very distinctive tail "
                f"sentence marker{cluster} variant {i % cluster_size}"
            )
        else:
            tail = f"unique{i} filler{i} text{i} body{i} word{i}"
        rows.append((i, f"{HOT_PHRASE} {tail}"))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_ngram_df_cap_bounds_pairs_under_stop_shingle(spark):
    n_docs, n_clusters, cluster_size = 1500, 3, 4
    df = _pathological_corpus(spark, n_docs, n_clusters, cluster_size)

    # the hot shingles really are in every doc (df = n_docs > 1000 cap)
    hot_df = (
        df.select(
            F.explode(dedup.word_shingles("text", 3)).alias("gram")
        )
        .groupBy("gram")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert hot_df == n_docs

    pairs = dedup.ngram_jaccard_pairs(df, threshold=0.1).collect()
    # hard ceiling: without the df<=1000 cap the stop-shingles alone
    # emit C(1500,2) ≈ 1.1M candidate pairs; with it, only grams shared
    # by <1000 docs pair — the cluster tails plus boundary collisions.
    ceiling = n_clusters * (cluster_size * (cluster_size - 1) // 2) * 4
    assert 0 < len(pairs) <= ceiling, len(pairs)
    # every intra-cluster pair survives (the cap cost recall ONLY on
    # hot-gram-evidence pairs, not on genuinely similar docs)
    found = {(r.id_a, r.id_b) for r in pairs}
    for c in range(n_clusters):
        ids = [c * cluster_size + j for j in range(cluster_size)]
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                assert (a, b) in found, (a, b)


def test_minhash_bucket_cap_bounds_candidates(spark):
    """300 byte-identical docs collapse into one hot bucket per band;
    with max_bucket_size below 300 they emit ZERO pairs, while a small
    genuine near-dup cluster with distinct text still pairs. Uncapped,
    the same corpus produces the full quadratic candidate set — the
    cap is what bounds the stage."""
    n_dup = 300
    dup_rows = [(i, HOT_PHRASE + " common boilerplate page body")
                for i in range(n_dup)]
    cluster_rows = [
        (1000 + j,
         "completely different cluster text about spark partitions "
         "and shuffle behavior at scale where adaptive execution "
         "splits skewed partitions and broadcasts small build sides "
         f"variant{j}")
        for j in range(5)
    ]
    df = spark.createDataFrame(
        dup_rows + cluster_rows, ["doc_id", "text"]
    )

    capped = dedup.minhash_lsh_pairs(
        df, threshold=0.5, max_bucket_size=100
    ).collect()
    # ceiling: only the 5-doc cluster may pair — C(5,2) = 10
    assert len(capped) <= 10, len(capped)
    cluster_pairs = {
        (r.id_a, r.id_b) for r in capped
        if r.id_a >= 1000 and r.id_b >= 1000
    }
    assert len(cluster_pairs) == len(capped)  # no hot-bucket leakage
    assert len(cluster_pairs) == 10  # recall intact off the hot bucket

    uncapped = dedup.minhash_lsh_pairs(
        df, threshold=0.5, max_bucket_size=10_000
    ).collect()
    # sanity that the cap (not banding) is what bounded the candidates:
    # identical docs estimate jaccard 1.0, all C(300,2) pairs emit
    assert len(uncapped) == n_dup * (n_dup - 1) // 2 + 10


def test_prefix_prefilter_admission_identical_and_no_index_shuffle(
    spark, tmp_path
):
    """The broadcast prefix-prefilter must not change admission (it is
    a superset reduction feeding the same exact anti-join) and must
    keep the index side shuffle-free (BroadcastHashJoin semi, no
    exchange between the index scan and the semi-join)."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.dedup import (
        dedup_against_index,
        incremental_exact_dedup,
    )

    docs = [(i, f"text {i % 37}") for i in range(200)]
    hist = spark.createDataFrame(docs[:120], "doc_id long, text string")
    idx = str(tmp_path / "fp_idx")
    incremental_exact_dedup(spark, hist, idx)  # seeds the index

    batch = spark.createDataFrame(
        [(1000 + i, f"text {i % 51}") for i in range(100)],
        "doc_id long, text string",
    )
    plain = {
        r["doc_id"]
        for r in dedup_against_index(spark, batch, idx).collect()
    }
    fast_df = dedup_against_index(
        spark, batch, idx, prefix_prefilter=True
    )
    fast = {r["doc_id"] for r in fast_df.collect()}
    assert fast == plain and plain  # identical, non-trivial

    plan = fast_df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in plan  # the prefix semi-join
    # the index-side scan feeds the broadcast semi-join directly:
    # no SortMergeJoin anywhere in the prefiltered plan
    assert "SortMergeJoin" not in plan


def test_incremental_dedup_soak_many_batches_matches_set_model(
    spark, tmp_path
):
    """20-batch soak: admission through the persisted fingerprint
    index must equal a Python first-seen set model under random
    cross-batch overlap, with the index growing exactly with distinct
    content (never with stream length)."""
    import random

    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.dedup import (
        incremental_exact_dedup,
    )

    rng = random.Random(17)
    idx = str(tmp_path / "soak_idx")
    seen: set[str] = set()
    next_id = 0
    for batch_no in range(20):
        rows = []
        for _ in range(rng.randrange(1, 12)):
            # small content space forces heavy overlap across batches
            rows.append((next_id, f"content {rng.randrange(40)}"))
            next_id += 1
        batch = spark.createDataFrame(rows, "doc_id long, text string")
        admitted = {
            (r["doc_id"], r["text"])
            for r in incremental_exact_dedup(spark, batch, idx).collect()
        }
        # model: first batch occurrence of never-seen content wins
        expected = {}
        for i, t in rows:
            if t not in seen and t not in expected:
                expected[t] = i
        assert admitted == {(i, t) for t, i in expected.items()}, batch_no
        seen.update(t for _, t in rows)
        # index rows == distinct content ever admitted
        assert spark.read.parquet(idx).count() == len(seen)
