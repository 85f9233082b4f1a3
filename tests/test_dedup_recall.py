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
