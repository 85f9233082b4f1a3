"""Round-13 operator additions: containment pairs, bloom prefilter
guarantees, MSTTR edges, MMR greedy properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.dedup import (
    bloom_build_ngrams,
    bloom_probe_ngrams,
    ngram_containment_pairs,
    ngram_jaccard_pairs,
    word_shingles,
)


def test_containment_catches_subset_jaccard_misses(spark):
    """A short doc quoted inside a much longer one: containment ~1,
    Jaccard small — the containment op must fire where Jaccard at the
    same bar does not."""
    quote = "alpha beta gamma delta epsilon zeta"
    longdoc = (
        "one two three four five six seven eight nine ten "
        + quote
        + " eleven twelve thirteen fourteen fifteen sixteen "
        "seventeen eighteen nineteen twenty twentyone twentytwo "
        "twentythree twentyfour twentyfive twentysix twentyseven"
    )
    df = spark.createDataFrame(
        [(1, quote), (2, longdoc), (3, "completely unrelated words here")],
        "doc_id long, text string",
    )
    cont = {
        (r.id_a, r.id_b): r.containment
        for r in ngram_containment_pairs(df, n=3, threshold=0.8).collect()
    }
    assert (1, 2) in cont and cont[(1, 2)] == 1.0
    jac = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(df, n=3, threshold=0.8).collect()
    }
    assert (1, 2) not in jac


def test_bloom_no_false_negatives_and_fp_visibility(spark):
    """Every true leak must be a bloom hit (no false negatives), and
    bloom_hits >= true_hits per doc."""
    ev = spark.createDataFrame(
        [(100, "secret eval question about dragons and castles")],
        "doc_id long, text string",
    )
    leak = "dragons and castles"
    train = spark.createDataFrame(
        [
            (1, "innocuous document about weather patterns today"),
            (2, "this one leaks secret eval question about dragons"),
            (3, "totally clean text with nothing shared at all"),
        ],
        "doc_id long, text string",
    )
    bloom = bloom_build_ngrams(ev, n=3)
    eval_grams = ev.select(
        F.explode(word_shingles("text", 3)).alias("gram")
    )
    rows = {
        r.doc_id: r
        for r in bloom_probe_ngrams(
            train, bloom, eval_grams, n=3
        ).collect()
    }
    # doc 2 shares 3-grams with the eval doc -> true hits > 0, and
    # every true hit was also a bloom hit
    assert rows[2].true_hits >= 1
    for r in rows.values():
        assert r.bloom_hits >= r.true_hits
    # exact ground truth: true_hits equals the exact intersection
    exact = (
        train.select(
            "doc_id", F.explode(word_shingles("text", 3)).alias("gram")
        )
        .join(eval_grams.distinct(), "gram", "left_semi")
        .groupBy("doc_id")
        .count()
        .collect()
    )
    want = {r["doc_id"]: r["count"] for r in exact}
    for d, r in rows.items():
        assert r.true_hits == want.get(d, 0)


def test_msttr_query_matches_hand_case(spark, tmp_path):
    """20-token segments: a doc of 40 identical tokens has msttr
    1/20; a doc of 40 distinct tokens has msttr 1.0; a 19-token doc
    emits no row."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark import (
        workloads_llm,
    )

    docs = spark.createDataFrame(
        [
            (1, " ".join(["x"] * 40), "en", "s", 0),
            (2, " ".join(f"w{i}" for i in range(40)), "en", "s", 0),
            (3, " ".join(f"w{i}" for i in range(19)), "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    p = str(tmp_path / "documents.parquet")
    docs.write.parquet(p)
    out = {
        r.doc_id: r
        for r in workloads_llm.doc_msttr.__wrapped__(
            spark, str(tmp_path)
        ).collect()
    }
    assert set(out) == {1, 2}
    assert out[1].msttr == 1.0 / 20.0 and out[1].n_segments == 2
    assert out[2].msttr == 1.0 and out[2].n_tokens == 40


def test_mmr_prefers_diversity_over_redundancy(spark):
    """Hand-built geometry: near-duplicate top hits must not BOTH be
    picked before a diverse lower-relevance candidate."""
    import math

    # 3D so a candidate can match the top hit's RELEVANCE while
    # pointing elsewhere (impossible in 2D, where relevance pins the
    # direction): 1 and 2 near-duplicates in the xy-plane, 3 equally
    # relevant but rotated into xz — at lambda=0.7 the greedy must
    # take 3 over the near-duplicate 2.
    rows = [
        (0, [1.0, 0.0, 0.0]),                                  # query
        (1, [math.cos(0.30), math.sin(0.30), 0.0]),            # top hit
        (2, [math.cos(0.31), math.sin(0.31), 0.0]),            # near-dup
        (3, [math.cos(0.35), 0.0, math.sin(0.35)]),            # diverse
        (4, [math.cos(1.20), 0.0, math.sin(1.20)]),            # far
    ]
    import tempfile

    from aws_sql_server_to_s3_datalake_etl_migration_spark import (
        workloads_curation,
    )

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(i, [float(x) for x in v], 0) for i, v in rows],
            "vec_id long, embedding array<float>, label int",
        ).write.parquet(td + "/embeddings.parquet")
        out = workloads_curation.emb_mmr_rerank.__wrapped__(
            spark, td
        ).collect()
    ranked = [r.vec_id for r in sorted(out, key=lambda r: r.rank)]
    assert ranked[0] == 1
    # the near-duplicate (2) must NOT be the second pick: the equally
    # relevant but diverse 3 displaces it at lambda=0.7
    assert ranked[1] == 3
    assert set(ranked) == {1, 2, 3, 4}


def test_neighborhood_growth_hand_and_random(spark):
    """Hand case + random-graph differential against python BFS."""
    import random as _random

    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.graph import (
        neighborhood_growth,
    )

    def py_balls(n, edges):
        adj = {v: set() for v in range(n)}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        out = {}
        for v in range(n):
            n1 = adj[v]
            n2 = set(n1)
            for u in n1:
                n2 |= adj[u]
            n2.discard(v)
            out[v] = (len(n1), len(n2))
        return out

    # path 0-1-2-3 plus isolated 4
    nodes = spark.createDataFrame([(i,) for i in range(5)], "node long")
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    got = {
        r.node: (r.n1, r.n2)
        for r in neighborhood_growth(nodes, e).collect()
    }
    assert got == {0: (1, 2), 1: (2, 3), 2: (2, 3), 3: (1, 2), 4: (0, 0)}

    rng = _random.Random(5)
    n = 25
    edges = {
        (min(a, b), max(a, b))
        for a, b in (
            (rng.randrange(n), rng.randrange(n)) for _ in range(50)
        )
        if a != b
    }
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    e = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {
        r.node: (r.n1, r.n2)
        for r in neighborhood_growth(nodes, e).collect()
    }
    assert got == py_balls(n, edges)


def test_neighborhood_growth_hot_degree_cap(spark):
    """Cap contract (r13 verdict item 6): capped n2 is a per-node
    LOWER BOUND of the truth — pairs dropped only when every route
    runs through an over-cap middle vertex — and n1 is unaffected.
    Differential against a python BFS that applies the same rule."""
    import random as _random

    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.graph import (
        neighborhood_growth,
    )

    # star hub 0 with leaves 1..6, plus a chord 1-2: through-hub
    # 2-hop pairs vanish at cap=3, the chord-route pair survives
    nodes = spark.createDataFrame([(i,) for i in range(7)], "node long")
    e = spark.createDataFrame(
        [(0, i) for i in range(1, 7)] + [(1, 2)], "src long, dst long"
    )
    uncapped = {
        r.node: (r.n1, r.n2)
        for r in neighborhood_growth(nodes, e).collect()
    }
    capped = {
        r.node: (r.n1, r.n2)
        for r in neighborhood_growth(
            nodes, e, hot_degree_cap=3
        ).collect()
    }
    # n1 identical; capped n2 <= uncapped n2 everywhere
    assert all(capped[v][0] == uncapped[v][0] for v in capped)
    assert all(capped[v][1] <= uncapped[v][1] for v in capped)
    # leaf 3 reaches {0} 1-hop; its 2-hop ball through the hub
    # (deg 6 > 3) is dropped: n2 collapses to n1
    assert uncapped[3] == (1, 6)
    assert capped[3] == (1, 1)
    # 1 and 2 still see each other's hub-free routes: direct edge in
    # n1 and ball through the chord middle (deg(1)=deg(2)=2 <= 3)
    assert capped[1][1] >= 2

    def py_balls_capped(n, edges, cap):
        adj = {v: set() for v in range(n)}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        out = {}
        for v in range(n):
            n1 = adj[v]
            n2 = set(n1)
            for u in n1:
                if len(adj[u]) <= cap:
                    n2 |= adj[u]
            n2.discard(v)
            out[v] = (len(n1), len(n2))
        return out

    rng = _random.Random(9)
    n = 30
    edges = {
        (min(a, b), max(a, b))
        for a, b in (
            (rng.randrange(n), rng.randrange(n)) for _ in range(70)
        )
        if a != b
    }
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    e = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {
        r.node: (r.n1, r.n2)
        for r in neighborhood_growth(
            nodes, e, hot_degree_cap=4
        ).collect()
    }
    assert got == py_balls_capped(n, edges, 4)
