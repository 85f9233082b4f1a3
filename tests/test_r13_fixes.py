"""Round-13 fixes: distributed CONVERT footer stats, partition-order
inference, non-Hive path rejection, and the size-gated broadcast
helper."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.hints import (
    maybe_broadcast,
)
from aws_sql_server_to_s3_datalake_etl_migration_spark.sources import (
    delta_log,
)
from aws_sql_server_to_s3_datalake_etl_migration_spark.sources.readers import (
    read_delta,
)


def _log_adds(path: str) -> list[dict]:
    out = []
    with open(
        os.path.join(path, "_delta_log", "0" * 20 + ".json")
    ) as fh:
        for line in fh:
            a = json.loads(line)
            if "add" in a:
                out.append(a["add"])
    return out


def test_convert_stats_collected_executor_side(spark, tmp_path):
    """A many-file (> the 8-file local-path cutoff) two-level
    partitioned table must convert with (a) partitionColumns in
    PHYSICAL nesting order — year before month even though 'month'
    sorts first alphabetically — and (b) footer stats on every add,
    proving the distributed mapInPandas stats path produces the same
    per-file JSON the local path does."""
    df = spark.createDataFrame(
        [
            (y, m, y * 100 + m * 10 + i, float(i))
            for y in (2023, 2024)
            for m in (1, 2, 3)
            for i in range(4)
        ],
        "year int, month int, id long, v double",
    )
    p = str(tmp_path / "tbl")
    # 4 writer tasks x 6 leaf dirs -> well over 8 files
    df.repartition(4, "id").write.partitionBy(
        "year", "month"
    ).parquet(p)
    n_files = sum(
        1
        for root, _, files in os.walk(p)
        for f in files
        if f.endswith(".parquet")
    )
    assert n_files > 8, "fixture must exercise the distributed path"
    assert delta_log.convert_to_delta(spark, p) == 0
    md = delta_log.latest_metadata(spark, p)
    # nesting order, not alphabetical ('month' < 'year')
    assert md["partitionColumns"] == ["year", "month"]
    adds = _log_adds(p)
    assert len(adds) == n_files
    for a in adds:
        assert set(a["partitionValues"]) == {"year", "month"}
        stats = json.loads(a["stats"])
        assert stats["numRecords"] >= 1
        assert "id" in stats["minValues"]
        assert stats["minValues"]["id"] <= stats["maxValues"]["id"]
    # converted table reads back exactly
    got = {r["id"] for r in read_delta(spark, p).collect()}
    assert got == {r["id"] for r in df.collect()}


def test_convert_rejects_non_hive_subdir(spark, tmp_path):
    """A data file under a non-k=v subdirectory is not a Hive layout:
    conversion must raise instead of fabricating a bogus partition
    key with an empty value."""
    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    p = tmp_path / "tbl"
    df.write.parquet(str(p / "sub"))
    # drop markers so only the stray layout remains visible
    with pytest.raises(ValueError, match="non-Hive path segment"):
        delta_log.convert_to_delta(spark, str(p))


def test_maybe_broadcast_size_gate(spark):
    """Under the bound -> ResolvedHint in the analyzed plan; a 1-byte
    bound -> no hint (AQE owns the strategy). size_of substitutes the
    probe frame."""
    small = spark.range(10).withColumnRenamed("id", "k")
    big_est = small.crossJoin(
        spark.range(100).withColumnRenamed("id", "j")
    )

    def n_hints(df):
        return (
            df._jdf.queryExecution().analyzed().toString()
        ).count("ResolvedHint")

    probe = spark.range(1000)
    joined = probe.join(maybe_broadcast(small), probe.id == small.k)
    assert n_hints(joined) == 1
    joined_no = probe.join(
        maybe_broadcast(small, bound_bytes=1), probe.id == small.k
    )
    assert n_hints(joined_no) == 0
    # size_of: the join-product estimate for big_est is huge, but the
    # caller-supplied base frame gates it back in
    assert n_hints(
        probe.join(
            maybe_broadcast(big_est, size_of=small),
            probe.id == big_est.k,
        )
    ) == 1


def _py_winnow_pos(text: str, k: int, w: int) -> set[tuple[int, int]]:
    """Sequential robust winnowing (rightmost-tie) ground truth."""
    s = list(text.lower().strip())
    b, p = 257, 1_000_000_007
    if len(s) < k:
        return set()
    hs = []
    for i in range(len(s) - k + 1):
        acc = 0
        for ch in s[i : i + k]:
            acc = (acc * b + ord(ch)) % p
        hs.append(acc)
    if len(hs) < w:
        return set()
    out = set()
    for j in range(len(hs) - w + 1):
        wnd = hs[j : j + w]
        mv = min(wnd)
        t = max(i for i, v in enumerate(wnd) if v == mv)
        out.add((mv, j + t))
    return out


def test_winnowing_positions_match_sequential(spark):
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.dedup import (
        winnowing_fingerprint_positions,
    )

    texts = [
        ("a", "the quick brown fox jumps over the lazy dog again"),
        ("b", "xyxy" * 9),          # forced hash ties -> rightmost rule
        ("c", ""),                   # empty
        ("d", "tiny"),               # below k
        ("e", "a" * 30),             # all-equal hashes, all ties
        ("f", None),                 # NULL text
    ]
    df = spark.createDataFrame(texts, "doc_id string, text string")
    got = {
        (r.doc_id, r.fp, r.pos)
        for r in winnowing_fingerprint_positions(df, k=5, w=4).collect()
    }
    want = {
        (i, fp, pos)
        for i, t in texts
        for fp, pos in _py_winnow_pos(t or "", 5, 4)
    }
    assert got == want


def test_copy_spans_guarantee_and_split(spark):
    """A planted copy of length >= w+k-1 must surface as one span
    whose bounds bracket the copied region in BOTH documents; an
    edit inside the copy (diagonal shift) must split the span."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.dedup import (
        copy_spans,
        winnowing_fingerprint_positions,
    )

    k, w = 5, 4
    copied = "copied paragraph body one two three four five"
    d1 = "AAAA here is a long unique prelude text " + copied + " suffix one"
    d2 = "totally different opening words then " + copied + " closing here"
    # d3 copies the same text but with one char inserted mid-way:
    # offset shifts, so matches split across two diagonals
    half = len(copied) // 2
    d3 = "yet another framing sentence " + copied[:half] + "Q" + copied[half:]
    df = spark.createDataFrame(
        [("d1", d1), ("d2", d2), ("d3", d3)],
        "doc_id string, text string",
    )
    spans = copy_spans(
        winnowing_fingerprint_positions(df, k=k, w=w), k=k, w=w
    ).collect()
    by_pair = {}
    for r in spans:
        by_pair.setdefault((r.left_id, r.right_id), []).append(r)
    # exact copy: one span bracketing the copied region on both sides
    s12 = by_pair[("d1", "d2")]
    assert len(s12) == 1
    r = s12[0]
    c1, c2 = d1.index(copied), d2.index(copied)
    assert r.start1 <= c1 + w + k - 2 and r.end1 >= c1 + len(copied) - (w + k - 1)
    assert r.start2 <= c2 + w + k - 2 and r.end2 >= c2 + len(copied) - (w + k - 1)
    assert r.n_fps >= 2
    # edited copy: the two halves land on different diagonals
    assert len(by_pair.get(("d1", "d3"), [])) >= 2
    diags = {r.start2 - r.start1 for r in by_pair[("d1", "d3")]}
    assert len(diags) >= 2
