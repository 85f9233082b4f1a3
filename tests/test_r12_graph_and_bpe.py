"""Round-12 additions: full core decomposition (h-index fixed point)
and the BPE token-id pipeline tail."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.graph import (
    coreness,
    k_core,
)


def _py_coreness(n_nodes: int, edges: set[tuple[int, int]]) -> dict:
    """Exact sequential core decomposition by min-degree peeling
    (Batagelj-Zaversnik order) — the definitional ground truth."""
    adj = {v: set() for v in range(n_nodes)}
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    core = {v: 0 for v in range(n_nodes)}
    deg = {v: len(adj[v]) for v in range(n_nodes)}
    alive = set(range(n_nodes))
    k = 0
    while alive:
        v = min(alive, key=lambda u: deg[u])
        k = max(k, deg[v])
        core[v] = k
        alive.discard(v)
        for u in adj[v]:
            if u in alive:
                deg[u] -= 1
    return core


def test_coreness_matches_sequential_peel_random(spark):
    rng = random.Random(12)
    for trial in range(3):
        n = 40
        edges = set()
        for _ in range(rng.randint(30, 90)):
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        want = _py_coreness(n, edges)
        nodes = spark.createDataFrame(
            [(i,) for i in range(n)], "node long"
        )
        e = spark.createDataFrame(
            [(a, b) for a, b in edges], "src long, dst long"
        )
        got = {
            r["node"]: r["coreness"]
            for r in coreness(nodes, e).collect()
        }
        assert got == want, f"trial {trial}: {got} != {want}"


def test_coreness_hand_cases(spark):
    # triangle + pendant: triangle nodes 2, pendant 1, isolated 0
    nodes = spark.createDataFrame([(i,) for i in range(5)], "node long")
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 3)], "src long, dst long"
    )
    got = {
        r["node"]: r["coreness"] for r in coreness(nodes, e).collect()
    }
    assert got == {0: 2, 1: 2, 2: 2, 3: 1, 4: 0}


def test_coreness_consistent_with_k_core(spark):
    """coreness >= k must equal k_core membership for every k that
    occurs — the new operator subsumes the old one."""
    rng = random.Random(7)
    n = 30
    edges = {(min(a, b), max(a, b))
             for a, b in ((rng.randrange(n), rng.randrange(n))
                          for _ in range(60)) if a != b}
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    e = spark.createDataFrame(sorted(edges), "src long, dst long")
    core = {
        r["node"]: r["coreness"] for r in coreness(nodes, e).collect()
    }
    for k in (1, 2, 3):
        member = {
            r["node"]: r["in_core"]
            for r in k_core(nodes, e, k).collect()
        }
        assert all(member[v] == (core[v] >= k) for v in core), k


def test_convert_to_delta_red_paths(spark, tmp_path):
    import pytest

    from aws_sql_server_to_s3_datalake_etl_migration_spark.sources import (
        delta_log,
    )
    from aws_sql_server_to_s3_datalake_etl_migration_spark.sources.readers import (
        read_delta,
    )

    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)],
        "id long, part int, v double",
    )
    # green: partitioned conversion, inferred cols, stats present
    p = str(tmp_path / "t1")
    df.write.partitionBy("part").parquet(p)
    v = delta_log.convert_to_delta(spark, p)
    assert v == 0
    got = {r["id"] for r in read_delta(spark, p).collect()}
    assert got == set(range(30))
    md = delta_log.latest_metadata(spark, p)
    assert md["partitionColumns"] == ["part"]
    # red: converting twice
    with pytest.raises(ValueError, match="already has a transaction"):
        delta_log.convert_to_delta(spark, p)
    # red: declared cols disagree with layout
    p2 = str(tmp_path / "t2")
    df.write.parquet(p2)
    with pytest.raises(ValueError, match="partition_cols"):
        delta_log.convert_to_delta(spark, p2, partition_cols=["part"])
    # green: unpartitioned
    assert delta_log.convert_to_delta(spark, p2) == 0
    assert read_delta(spark, p2).count() == 30
    # red: empty dir
    p3 = str(tmp_path / "t3")
    (tmp_path / "t3").mkdir()
    with pytest.raises(ValueError, match="no parquet data files"):
        delta_log.convert_to_delta(spark, p3)
    # converted table is mutable: delete rewrites only hit files
    delta_log.delete_where(spark, p, F.col("id") < 10)
    assert read_delta(spark, p).count() == 20


def _py_winnow(text: str, k: int, w: int) -> set[int]:
    s = [c for c in text.lower().strip() if True]
    s = [c for c in "".join(s) if c != ""]
    chars = [c for c in "".join(s)]
    chars = [c for c in (text or "").lower().strip()]
    if len(chars) < k + w - 1:
        return set()
    hs = []
    for i in range(len(chars) - k + 1):
        h = 0
        for c in chars[i:i + k]:
            h = (h * 257 + ord(c)) % 1_000_000_007
        hs.append(h)
    return {min(hs[j:j + w]) for j in range(len(hs) - w + 1)}


def test_winnowing_matches_python_and_guarantee(spark):
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.dedup import (
        winnowing_fingerprints,
    )

    shared = "this exact sentence is long enough to be guaranteed"
    rows = [
        (1, "prefix junk " + shared + " suffix one"),
        (2, "totally different opening " + shared + " and ending"),
        (3, "no overlap with anybody else at all here"),
        (4, ""),
        (5, None),
        (6, "short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, set] = {i: set() for i, _ in rows}
    for r in winnowing_fingerprints(df, "doc_id", "text", 16, 8).collect():
        got[r["doc_id"]].add(r["fp"])
    for i, t in rows:
        assert got[i] == _py_winnow(t or "", 16, 8), f"doc {i}"
    # the winnowing guarantee: a shared run of >= k+w-1 chars shares
    # at least one fingerprint
    assert got[1] & got[2]
    assert not (got[3] & got[1])
    assert got[4] == set() and got[5] == set() and got[6] == set()
    # density: ~2/(w+1) of k-grams selected (loose upper bound check)
    n_grams = len((rows[0][1])) - 16 + 1
    assert len(got[1]) <= n_grams
