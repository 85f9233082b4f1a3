"""Round-14 operator tests: count-min sketch, explicit HLL identity,
binned interval join, changepoint detection, feature hashing."""

import pytest
from pyspark.sql import functions as F


def _py_cms(tokens, d, w):
    """Python reference CMS using the repo's polynomial hashes."""
    B1, P1 = 257, 1_000_000_007
    B2, P2 = 131, 998_244_353

    def h(t, b, p):
        a = 0
        for ch in t:
            a = (a * b + ord(ch)) % p
        return a

    cells = {}
    for t in tokens:
        h1, h2 = h(t, B1, P1), h(t, B2, P2)
        for j in range(d):
            cells[(j, (h1 + j * h2) % w)] = (
                cells.get((j, (h1 + j * h2) % w), 0) + 1
            )
    return cells, h


def test_cms_matches_python_and_overestimates(spark):
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.textops import (
        cms_build_tokens,
        cms_estimate,
    )

    rows = [
        (0, "alpha beta alpha gamma"),
        (1, "beta beta delta"),
        (2, "alpha epsilon zeta zeta zeta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sketch = cms_build_tokens(df, d=2, w=16)
    got = {
        (r.row, r.bucket): r.cnt for r in sketch.collect()
    }
    toks = [t for _, s in rows for t in s.split()]
    want, _ = _py_cms(toks, 2, 16)
    assert got == want

    from collections import Counter

    true = Counter(toks)
    terms = spark.createDataFrame(
        [(t,) for t in true], "token string"
    )
    est = {
        r.token: r.est_cnt
        for r in cms_estimate(terms, sketch, d=2, w=16).collect()
    }
    # CMS guarantee: est >= true for every queried term
    assert all(est[t] >= c for t, c in true.items())


def test_cms_mergeable_by_cellwise_addition(spark):
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.textops import (
        cms_build_tokens,
    )

    a = spark.createDataFrame(
        [(0, "x y z x"), (1, "y y w")], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(2, "x w w q")], "doc_id long, text string"
    )
    whole = cms_build_tokens(a.unionByName(b), d=3, w=32)
    merged = (
        cms_build_tokens(a, d=3, w=32)
        .unionByName(cms_build_tokens(b, d=3, w=32))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_cms_unseen_term_estimates_zero_unless_collision(spark):
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.textops import (
        cms_build_tokens,
        cms_estimate,
    )

    df = spark.createDataFrame(
        [(0, "only these words")], "doc_id long, text string"
    )
    # big w: collisions vanish, so an unseen term must estimate 0
    sketch = cms_build_tokens(df, d=4, w=1 << 14)
    est = cms_estimate(
        spark.createDataFrame(
            [("absent_term_xyz",)], "token string"
        ),
        sketch,
        d=4,
        w=1 << 14,
    ).collect()
    assert est[0].est_cnt == 0


def test_hll_explicit_union_is_registerwise_max(spark):
    """The HLL mergeability identity on the explicit-register twin:
    registers built from A ∪ B equal the cell-wise max of registers
    built from A and from B."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark.workloads_timeseries import (
        _HLL_A1,
        _HLL_A2,
        _HLL_B1,
        _HLL_B2,
        _HLL_M,
        _HLL_P,
    )

    def regs(ids):
        out = {}
        for u in ids:
            reg = (_HLL_A1 * u + _HLL_B1) % _HLL_P % _HLL_M
            h2 = (_HLL_A2 * u + _HLL_B2) % _HLL_P
            rho = 32 if h2 == 0 else 31 - len(bin(h2)[2:]) + 1
            out[reg] = max(out.get(reg, 0), rho)
        return out

    a = list(range(0, 80))
    b = list(range(50, 150))
    whole = regs(set(a) | set(b))
    ra, rb = regs(a), regs(b)
    merged = {
        k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)
    }
    assert whole == merged
    # and the python rho matches the engine's bin()-length identity
    df = spark.createDataFrame([(u,) for u in a], "user_id long")
    got = {
        r.register: r.rho
        for r in df.select(
            ((F.col("user_id") * _HLL_A1 + _HLL_B1) % _HLL_P % _HLL_M)
            .alias("register"),
            F.when(
                ((F.col("user_id") * _HLL_A2 + _HLL_B2) % _HLL_P) == 0,
                F.lit(32),
            )
            .otherwise(
                F.lit(31)
                - F.length(
                    F.bin(
                        (F.col("user_id") * _HLL_A2 + _HLL_B2)
                        % _HLL_P
                    )
                )
                + F.lit(1)
            )
            .alias("rho"),
        )
        .groupBy("register")
        .agg(F.max("rho").alias("rho"))
        .collect()
    }
    assert got == ra


def test_incident_window_join_hand_case(spark, tmp_path):
    """Three events: an incident at t0, one event inside its window,
    one outside; counts must be exact and the out-of-window event
    excluded even though it shares the incident's second bin."""
    import pandas as pd

    from aws_sql_server_to_s3_datalake_etl_migration_spark.workloads_timeseries import (
        _IW_NS,
        events_incident_window_join,
    )

    base = pd.Timestamp("2024-01-01 00:10:00")
    rows = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": [
                base,
                base + pd.Timedelta(minutes=29),
                base + pd.Timedelta(minutes=31),
            ],
            "user_id": [7, 8, 9],
            "event_type": ["error", "click", "click"],
            "value": [150.0, 2.5, 3.5],
            "props": ["{}", "{}", "{}"],
        }
    )
    rows.to_parquet(tmp_path / "events.parquet")
    out = {
        r.incident_id: (r.n_events, r.n_users, r.sum_value)
        for r in events_incident_window_join(
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {1: (1, 1, 2.5)}
    assert _IW_NS == 30 * 60 * 1_000_000_000


def test_changepoint_finds_planted_shift(spark, tmp_path):
    """A daily count series that jumps 5 -> 50 after Jan 10 must
    split at Jan 10 (last day of the low segment)."""
    import pandas as pd

    from aws_sql_server_to_s3_datalake_etl_migration_spark.workloads_timeseries import (
        events_changepoint,
    )

    recs = []
    eid = 0
    for d in range(1, 21):
        n = 5 if d <= 10 else 50
        for i in range(n):
            recs.append(
                (
                    eid,
                    pd.Timestamp(f"2024-01-{d:02d} 12:00:00")
                    + pd.Timedelta(seconds=i),
                    1,
                    "click",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    pd.DataFrame(
        recs,
        columns=[
            "event_id",
            "ts",
            "user_id",
            "event_type",
            "value",
            "props",
        ],
    ).to_parquet(tmp_path / "events.parquet")
    out = events_changepoint(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert str(out[0].split_day) == "2024-01-10"


def test_feature_hashing_signs_cancel(spark):
    """Weights are signed counts: a token appearing k times adds ±k
    to its bucket, and two tokens with opposite signs in the same
    bucket cancel toward zero — verified against a python fold."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.dedup import (
        _BLOOM_B1,
        _BLOOM_B2,
        _BLOOM_P1,
        _BLOOM_P2,
    )
    from aws_sql_server_to_s3_datalake_etl_migration_spark.workloads_llm import (
        _FH_DIM,
    )

    def h(t, b, p):
        a = 0
        for ch in t:
            a = (a * b + ord(ch)) % p
        return a

    text = "red blue red green blue blue"
    want = {}
    for t in text.split():
        bucket = h(t, _BLOOM_B1, _BLOOM_P1) % _FH_DIM
        sgn = 1 if h(t, _BLOOM_B2, _BLOOM_P2) % 2 == 0 else -1
        want[bucket] = want.get(bucket, 0) + sgn
    want = {b: w for b, w in want.items() if w != 0}

    import aws_sql_server_to_s3_datalake_etl_migration_spark.workloads_llm as wl

    docs = spark.createDataFrame(
        [(0, text)], "doc_id long, text string"
    )
    # drive the same expression path as the registered query
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.dedup import (
        _gram_hash,
    )
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.textops import (
        tokens,
    )

    toks = docs.select(F.explode(tokens("text")).alias("t"))
    h1 = _gram_hash(F.col("t"), _BLOOM_B1, _BLOOM_P1)
    h2 = _gram_hash(F.col("t"), _BLOOM_B2, _BLOOM_P2)
    got = {
        r.bucket: r.weight
        for r in toks.select(
            (h1 % _FH_DIM).alias("bucket"),
            F.when(h2 % 2 == 0, F.lit(1))
            .otherwise(F.lit(-1))
            .alias("sgn"),
        )
        .groupBy("bucket")
        .agg(F.sum("sgn").cast("bigint").alias("weight"))
        .where(F.col("weight") != 0)
        .collect()
    }
    assert got == want


def test_personalized_pagerank_seed_locality(spark):
    """PPR sanity on a two-component graph: all mass stays in the
    seed's component; the global variant spreads mass everywhere."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.graph import (
        pagerank_fixedpoint,
    )

    nodes = spark.createDataFrame(
        [(i,) for i in range(6)], "node long"
    )
    # component A: 0-1-2 cycle; component B: 3-4-5 cycle
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    ppr = {
        r.node: r.score
        for r in pagerank_fixedpoint(
            nodes, edges, iters=4, seed_nodes=seeds
        ).collect()
    }
    assert all(ppr[v] > 0 for v in (0, 1, 2))
    assert all(ppr[v] == 0 for v in (3, 4, 5))
    glob = {
        r.node: r.score
        for r in pagerank_fixedpoint(nodes, edges, iters=4).collect()
    }
    assert all(glob[v] > 0 for v in range(6))
