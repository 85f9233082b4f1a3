"""Round-10 additions: fixed-point PageRank (operators/graph.py) and
the collocation / novelty / Gini / byte-histogram workloads, each
checked against hand-computed or pure-Python-mirrored expectations on
tiny crafted corpora (the oracle harness cross-checks them against
DuckDB at sf0.01; these pin the SEMANTICS on inputs small enough to
verify by hand)."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.graph import (
    pagerank_fixedpoint,
)
from aws_sql_server_to_s3_datalake_etl_migration_spark.workloads_llm import (
    _SIGN_HEX,
    doc_collocation_lift,
    doc_ngram_novelty_curve,
    doc_source_gini,
    mm_byte_histogram_checked,
)


def _pagerank_mirror(nodes, edges, iters=5, scale=1_000_000,
                     damp_num=85, damp_den=100):
    """Pure-Python mirror of the fixed-point arithmetic."""
    edges = sorted(set(edges))
    outdeg = collections.Counter(s for s, _ in edges)
    base = (scale * (damp_den - damp_num)) // damp_den
    score = {n: scale for n in nodes}
    for _ in range(iters):
        recv = collections.defaultdict(int)
        for s, d in edges:
            recv[d] += score[s] // outdeg[s]
        score = {
            n: base + (damp_num * recv.get(n, 0)) // damp_den
            for n in nodes
        }
    return score


def test_pagerank_fixedpoint_matches_pure_python_mirror(spark):
    nodes = [1, 2, 3, 4]
    # 4 is dangling (its mass drops); 1 has two out-edges (floor
    # division visible); a duplicate edge checks the dedup
    edges = [(1, 2), (1, 3), (2, 1), (3, 1), (4, 1), (1, 2)]
    ndf = spark.createDataFrame([(n,) for n in nodes], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["score"]
        for r in pagerank_fixedpoint(ndf, edf, iters=5).collect()
    }
    assert got == _pagerank_mirror(nodes, edges, iters=5)


def test_pagerank_symmetric_pair_stays_symmetric(spark):
    ndf = spark.createDataFrame([(1,), (2,)], "node long")
    edf = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    got = {
        r["node"]: r["score"]
        for r in pagerank_fixedpoint(ndf, edf, iters=4).collect()
    }
    # a 2-cycle is symmetric: both nodes keep the full stationary
    # score at every iteration
    assert got[1] == got[2] == 1_000_000


def _write_docs(spark, tmp_path, rows):
    """rows: (doc_id, text, lang, source)"""
    df = spark.createDataFrame(
        [(i, t, lg, src, len(t)) for i, t, lg, src in rows],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_collocation_lift_hand_case(spark, tmp_path):
    sf = _write_docs(
        spark, tmp_path, [(0, "x y x y x y", "en", "a")]
    )
    rows = doc_collocation_lift(spark, sf).collect()
    # bigrams: (x,y) x3, (y,x) x2 — only (x,y) clears the >=3 floor;
    # lift = n12*N/(n1*n2) = 3*6/(3*3) = 2.0 exactly
    assert len(rows) == 1
    r = rows[0]
    assert (r["w1"], r["w2"], r["n12"], r["n1"], r["n2"]) == (
        "x", "y", 3, 3, 3,
    )
    assert r["lift"] == 2.0


def test_ngram_novelty_curve_hand_case(spark, tmp_path):
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, "a b c d", "en", "a"),   # batch 0: {a b c, b c d}
            (10, "a b c", "en", "a"),    # batch 0: {a b c}
            (1, "a b c x", "en", "a"),   # batch 1: {a b c, b c x}
        ],
    )
    got = {
        r["batch"]: (r["n_distinct"], r["n_novel"], r["novelty_rate"])
        for r in doc_ngram_novelty_curve(spark, sf).collect()
    }
    assert got == {0: (2, 2, 1.0), 1: (2, 1, 0.5)}


def test_source_gini_extremes(spark, tmp_path):
    sf = _write_docs(
        spark,
        tmp_path,
        # source a: four equal docs -> Gini 0
        [(i, "w w", "en", "a") for i in range(4)]
        # source b: x = [1, 1, 1, 7] -> G = (2*34 - 5*10)/(4*10)
        + [
            (10, "w", "en", "b"),
            (11, "w", "en", "b"),
            (12, "w", "en", "b"),
            (13, "w w w w w w w", "en", "b"),
        ],
    )
    got = {
        r["source"]: (r["n_docs"], r["total_tokens"], r["gini"])
        for r in doc_source_gini(spark, sf).collect()
    }
    assert got["a"] == (4, 8, 0.0)
    assert got["b"] == (4, 10, pytest.approx(0.45, abs=1e-12))


def test_byte_histogram_matches_python_counter(spark, tmp_path):
    texts = {0: "aaab", 5: "zz", 7: "abc abc", 14: ""}
    sf = _write_docs(
        spark,
        tmp_path,
        [(i, t, "en", "a") for i, t in texts.items()],
    )
    got = {
        r["asset_id"]: (
            r["n_bytes"], r["distinct_bytes"], r["sum_sq_counts"],
            r["zero_cnt"],
        )
        for r in mm_byte_histogram_checked(spark, sf).collect()
    }
    want = {}
    for i, t in texts.items():
        content = t.encode()
        if i % 7 != 0:  # every 7th asset ships unsigned
            modality = ("image", "audio", "video")[i % 3]
            content = bytes.fromhex(_SIGN_HEX[modality]) + content
        if not content:
            continue  # empty assets carry no byte rows on either side
        c = collections.Counter(content)
        want[i] = (
            len(content),
            len(c),
            sum(v * v for v in c.values()),
            c.get(0, 0),
        )
    assert got == want


# ---------------------------------------------------------------------------
# round 11: connected components on the graph surface + lineage fix
# ---------------------------------------------------------------------------


def test_graph_connected_components_matches_union_find(spark):
    """graph.connected_components (the dedup labeling re-exported on
    the graph surface) must match a pure-Python union-find on a mixed
    graph: chains (diameter ~10), a star, singletons, and a cycle."""
    import time

    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.graph import (
        connected_components,
    )

    edges = []
    # two 11-node chains (diameter 10 — exercises many rounds)
    for base in (0, 20):
        edges += [(base + i, base + i + 1) for i in range(10)]
    # a star at 40
    edges += [(40, 41), (40, 42), (40, 43)]
    # a 4-cycle at 50
    edges += [(50, 51), (51, 52), (52, 53), (53, 50)]
    nodes = sorted({n for e in edges for n in e} | {60, 61})  # singletons

    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in nodes}

    ndf = spark.createDataFrame([(n,) for n in nodes], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    t0 = time.time()
    got = {
        r["node"]: r["component"]
        for r in connected_components(ndf, edf).collect()
    }
    elapsed = time.time() - t0
    assert got == want
    # lineage regression (r11): before the single-reference rewrite
    # (self-loops fold keep-own-label into the neighbor-min agg),
    # each round DOUBLED the logical plan (labels was referenced
    # twice), so a diameter-10 graph spent minutes in pure Catalyst
    # re-analysis (measured: 56 s for round 7's analysis alone).
    # Post-fix the plan grows linearly and 11 rounds of tiny joins
    # finish in well under this generous bound.
    assert elapsed < 120, f"lineage blowup? {elapsed:.0f}s"
