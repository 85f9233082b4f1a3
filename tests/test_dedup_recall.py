"""Recall of the approximate near-dup operators against their exact
baselines: LSH variants may miss pairs (that is the trade), but on the
fixture data they must find a solid fraction of what the exact
operators find — a silent recall collapse (e.g. a broken band hash)
fails here, not in production."""

from __future__ import annotations

from aws_sql_server_to_s3_datalake_etl_migration_spark import workloads

from conftest import SF_SMOKE


def _pairs(df, a="id_a", b="id_b"):
    return {
        (min(r[a], r[b]), max(r[a], r[b])) for r in df.select(a, b).collect()
    }


def test_embedding_lsh_recall_vs_exact(spark):
    qs = workloads.queries()
    exact = _pairs(qs["emb_exact_neardup_pairs"](spark, SF_SMOKE))
    lsh = _pairs(qs["emb_neardup_pairs"](spark, SF_SMOKE))
    assert exact, "fixture produced no exact pairs; test is vacuous"
    # no false positives beyond the cosine check (LSH verifies cosine)
    assert lsh <= exact or len(lsh - exact) == 0
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.5, f"LSH recall collapsed: {recall:.2f}"


def test_minhash_lsh_finds_exact_jaccard_dups(spark):
    qs = workloads.queries()
    # exact n-gram Jaccard pairs at the same shingle size are the
    # ground truth; minhash-LSH should recover most high-sim pairs
    exact = _pairs(qs["doc_ngram_jaccard_pairs"](spark, SF_SMOKE))
    mh = _pairs(qs["doc_minhash_lsh_pairs"](spark, SF_SMOKE))
    if not exact:
        assert mh == set() or mh  # nothing to measure at this sf
        return
    recall = len(mh & exact) / len(exact)
    assert recall >= 0.5, f"MinHash recall collapsed: {recall:.2f}"


def test_simhash_banding_is_exact_for_advertised_distance(spark):
    """bands = max_hamming + 1 makes banding EXACT by pigeonhole: the
    banded candidate join must find every pair at Hamming distance
    <= max_hamming, verified against a brute-force all-pairs popcount
    on the same fingerprints."""
    from pyspark.sql import functions as F

    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators import dedup

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    for max_hamming in (3, 8):
        banded = _pairs(
            dedup.simhash_pairs(docs, "doc_id", "text", max_hamming)
        )
        fps = dedup.simhash_fingerprints(docs, "doc_id", "text")
        a = fps.select(
            F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a")
        )
        b = fps.select(
            F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b")
        )
        exact = _pairs(
            a.join(b, F.col("id_a") < F.col("id_b"))
            .where(
                F.bit_count(
                    F.col("sh_a").bitwiseXOR(F.col("sh_b"))
                ) <= max_hamming
            )
        )
        assert banded == exact, (
            f"banding lost pairs at max_hamming={max_hamming}: "
            f"missed {len(exact - banded)}, extra {len(banded - exact)}"
        )
    assert dedup.simhash_bands(8) == [
        (0, 8), (8, 7), (15, 7), (22, 7), (29, 7), (36, 7), (43, 7),
        (50, 7), (57, 7),
    ]


def test_incremental_exact_dedup_across_batches(spark, tmp_path):
    """Cross-batch dedup without rescanning history: batch-internal
    dupes collapse, content already admitted by an earlier batch is
    rejected, replaying a whole batch admits nothing."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.dedup import (
        incremental_exact_dedup,
    )

    idx = str(tmp_path / "fp_index")
    b1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], "doc_id long, text string"
    )
    a1 = incremental_exact_dedup(spark, b1, idx)
    got1 = {(r["doc_id"], r["text"]) for r in a1.select("doc_id", "text").collect()}
    assert got1 == {(1, "alpha"), (2, "beta")}
    b2 = spark.createDataFrame(
        [(10, "beta"), (11, "gamma"), (12, "gamma")],
        "doc_id long, text string",
    )
    a2 = incremental_exact_dedup(spark, b2, idx)
    assert {r["doc_id"] for r in a2.collect()} == {11}
    # replay of batch 2: fully rejected, index unchanged
    a3 = incremental_exact_dedup(spark, b2, idx)
    assert a3.count() == 0
    assert spark.read.parquet(idx).count() == 3


def test_incremental_near_dedup_across_batches(spark, tmp_path):
    """Near-dup admission against the band index: batch-internal
    near-dup clusters collapse to one survivor, a later batch's
    near-copy of admitted history is rejected, dissimilar docs pass,
    and a replayed batch admits nothing."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.dedup import (
        incremental_near_dedup,
    )

    base = ("the quick brown fox jumps over the lazy dog while rain "
            "falls softly on the quiet green meadow near the river")
    near = base.replace("quiet", "calm")          # high-jaccard variant
    other = ("completely different subject matter entirely about "
             "spark physical plans shuffles and broadcast joins at "
             "massive scale with adaptive execution everywhere")
    idx = str(tmp_path / "band_idx")

    b1 = spark.createDataFrame(
        [(1, base), (2, near)], "doc_id long, text string"
    )
    a1 = incremental_near_dedup(spark, b1, idx)
    assert [r["doc_id"] for r in a1.collect()] == [1]   # cluster -> min id

    b2 = spark.createDataFrame(
        [(10, base.replace("softly", "gently")), (11, other)],
        "doc_id long, text string",
    )
    a2 = incremental_near_dedup(spark, b2, idx)
    assert {r["doc_id"] for r in a2.collect()} == {11}

    a3 = incremental_near_dedup(spark, b2, idx)          # replay
    assert a3.count() == 0
