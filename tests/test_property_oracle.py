"""Property-based differential tests (SURVEY.md §5 stretch): random
IN-lists, watermarks, and range predicates must agree with DuckDB on
the same parquet, and header sanitization must always emit
parquet-legal identifiers."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from aws_sql_server_to_s3_datalake_etl_migration_spark.functions.names import (
    sanitize_identifier,
)
from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.temporal import (
    asof_join,
)

from conftest import SF_SMOKE

from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_SMOKE}/orders.parquet'"
    )
    return con


@given(keys=st.lists(st.integers(0, 24), min_size=1, max_size=60))
@settings(**_SETTINGS)
def test_in_list_filter_matches_duckdb(spark, duck, keys):
    n_spark = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .where((F.col("o_custkey") % 25).isin(keys))
        .count()
    )
    in_list = ", ".join(map(str, keys))
    n_duck = duck.sql(
        f"SELECT COUNT(*) FROM orders WHERE o_custkey % 25 IN ({in_list})"
    ).fetchone()[0]
    assert n_spark == n_duck


@given(wm=st.integers(-10, 2_000))
@settings(**_SETTINGS)
def test_watermark_filter_matches_duckdb(spark, duck, wm):
    n_spark = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .where(F.col("o_orderkey") > wm)
        .count()
    )
    n_duck = duck.sql(
        f"SELECT COUNT(*) FROM orders WHERE o_orderkey > {wm}"
    ).fetchone()[0]
    assert n_spark == n_duck


@given(
    lo=st.floats(0, 500_000, allow_nan=False),
    hi=st.floats(0, 500_000, allow_nan=False),
)
@settings(**_SETTINGS)
def test_range_predicate_matches_duckdb(spark, duck, lo, hi):
    lo, hi = min(lo, hi), max(lo, hi)
    n_spark = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .where(F.col("o_totalprice").between(lo, hi))
        .count()
    )
    n_duck = duck.sql(
        "SELECT COUNT(*) FROM orders WHERE o_totalprice "
        f"BETWEEN {lo!r} AND {hi!r}"
    ).fetchone()[0]
    assert n_spark == n_duck


@given(name=st.text(min_size=0, max_size=40))
@settings(max_examples=200, deadline=None)
def test_sanitize_identifier_always_parquet_legal(name):
    out = sanitize_identifier(name)
    assert not set(out) & set(" ,;{}()\n\t=")
    assert out == out.strip()


_TOKEN_ALPHABET = st.sampled_from(["a", "b", "ab", "xy", "z9"])
_SEP = st.sampled_from([" ", "  ", "\n", " \n "])


@st.composite
def _texts(draw):
    parts = draw(st.lists(_TOKEN_ALPHABET, min_size=0, max_size=12))
    seps = [draw(_SEP) for _ in parts]
    return "".join(t + s for t, s in zip(parts, seps)).rstrip()


@given(texts=st.lists(_texts(), min_size=1, max_size=6))
@settings(**_SETTINGS)
def test_repetition_stats_match_python_reference(spark, texts):
    """with_repetition_stats (codegen fold) vs a direct Python
    reimplementation on random whitespace/newline-shaped text."""
    import re
    from collections import Counter

    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators import (
        textops,
    )

    def ref(text):
        lines = [s.strip() for s in text.split("\n")]
        lines = [s for s in lines if s]
        dup = 1.0 - len(set(lines)) / len(lines) if lines else 0.0
        toks = re.split(r"\s+", text.strip()) if text.strip() else []
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        top = max(Counter(bgs).values()) / len(bgs) if bgs else 0.0
        return (len(lines), pytest.approx(dup), pytest.approx(top))

    df = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    got = {
        r.doc_id: (r.n_lines, r.dup_line_frac, r.top_bigram_frac)
        for r in textops.with_repetition_stats(df).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == ref(t), f"text={t!r}"


@given(
    left=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 30)),
        min_size=1, max_size=25,
    ),
    right=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 30)),
        min_size=0, max_size=25,
    ),
)
@settings(**_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    """asof_join == pandas merge_asof across backward/forward ×
    tolerance × duplicate right timestamps × keys with no right rows
    (the advertised semantics, operators/temporal.py)."""
    import pandas as pd

    ldf = (
        spark.createDataFrame(
            [(i, k, t * 1_000_000) for i, (k, t) in enumerate(left)],
            ["event_id", "user_id", "us"],
        ).select("event_id", "user_id", F.timestamp_micros("us").alias("ts"))
    )
    rdf_rows = [(k, t * 1_000_000) for k, t in right]
    rdf = spark.createDataFrame(
        rdf_rows or [(None, None)], "user_id BIGINT, us BIGINT"
    ).where(F.col("us").isNotNull()).select(
        "user_id", F.timestamp_micros("us").alias("ts")
    )

    lpd = pd.DataFrame(
        {
            "event_id": range(len(left)),
            "user_id": [k for k, _ in left],
            "ts": pd.to_datetime([t for _, t in left], unit="s"),
        }
    ).sort_values("ts", kind="mergesort")
    rpd = (
        pd.DataFrame(
            {
                "user_id": pd.Series(
                    [k for k, _ in right], dtype="int64"
                ),
                "ts": pd.to_datetime([t for _, t in right], unit="s"),
            }
        )
        .drop_duplicates()
        .sort_values("ts", kind="mergesort")
    )

    for direction in ("backward", "forward"):
        for tolerance in (None, "5 seconds"):
            got = {
                r["event_id"]: r["matched_ts"]
                for r in asof_join(
                    ldf, rdf, on="user_id",
                    direction=direction, tolerance=tolerance,
                ).collect()
            }
            expected = pd.merge_asof(
                lpd,
                rpd.rename(columns={"ts": "matched_ts"}),
                left_on="ts",
                right_on="matched_ts",
                by="user_id",
                direction=direction,
                tolerance=None if tolerance is None
                else pd.Timedelta(seconds=5),
            )
            for _, row in expected.iterrows():
                want = (
                    None if pd.isna(row["matched_ts"])
                    else row["matched_ts"].to_pydatetime()
                )
                assert got[row["event_id"]] == want, (
                    direction, tolerance, row["event_id"],
                    got[row["event_id"]], want,
                )


@given(
    feed=st.lists(
        st.tuples(
            st.integers(0, 6),             # key
            st.integers(0, 999),           # value payload
            st.sampled_from("IUD"),        # op
        ),
        min_size=0,
        max_size=40,
    ),
    snap_keys=st.lists(st.integers(0, 6), max_size=5, unique=True),
)
@settings(**_SETTINGS)
def test_cdc_apply_changes_matches_python_replay(spark, feed, snap_keys):
    """cdc_apply_changes == a pure-Python dict replay of the feed in
    sequence order, for arbitrary interleavings of I/U/D per key over
    an arbitrary starting snapshot (sequence = feed position, so
    every sequence is unique and ordering is total)."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.incremental import (
        cdc_apply_changes,
    )

    snap_rows = [(k, -k) for k in snap_keys]
    snap = spark.createDataFrame(
        snap_rows or [(None, None)], "id long, v long"
    ).where(F.col("id").isNotNull())
    ch_rows = [
        (k, v, i, op) for i, (k, v, op) in enumerate(feed)
    ]
    ch = spark.createDataFrame(
        ch_rows or [(None, None, None, None)],
        "id long, v long, seq long, op string",
    ).where(F.col("id").isNotNull())

    got = {
        (r["id"], r["v"])
        for r in cdc_apply_changes(snap, ch, "id").collect()
    }

    table = {k: -k for k in snap_keys}
    for k, v, op in feed:  # feed position == sequence order
        if op == "D":
            table.pop(k, None)
        else:
            table[k] = v
    assert got == set(table.items())


@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=1, max_size=25,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50),
                  st.integers(0, 9)),
        min_size=0, max_size=25,
    ),
)
@settings(**_SETTINGS)
def test_asof_join_payload_matches_pandas_merge_asof(spark, left, right):
    """asof_join_payload == pandas merge_asof WITH attached value
    columns, under duplicate right timestamps (resolved to the
    lexicographic-max payload on both sides) and unmatched keys."""
    import pandas as pd

    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.temporal import (
        asof_join_payload,
    )

    ldf = spark.createDataFrame(
        [(i, k, t * 1_000_000) for i, (k, t) in enumerate(left)],
        ["event_id", "user_id", "us"],
    ).select("event_id", "user_id", F.timestamp_micros("us").alias("ts"))
    rdf = spark.createDataFrame(
        [(k, t * 1_000_000, p) for k, t, p in right]
        or [(None, None, None)],
        "user_id BIGINT, us BIGINT, payload BIGINT",
    ).where(F.col("us").isNotNull()).select(
        "user_id", F.timestamp_micros("us").alias("ts"), "payload"
    )

    got = {
        r["event_id"]: r["r_payload"]
        for r in asof_join_payload(
            ldf, rdf, on="user_id", payload_cols=["payload"]
        ).collect()
    }

    # pandas reference: reduce right to max payload per (key, ts) —
    # the operator's documented tie rule — then merge_asof
    lpd = pd.DataFrame({
        "event_id": range(len(left)),
        "user_id": [k for k, _ in left],
        "ts": pd.to_datetime([t for _, t in left], unit="s"),
    }).sort_values("ts", kind="mergesort")
    rpd = pd.DataFrame({
        "user_id": pd.Series([k for k, _, _ in right], dtype="int64"),
        "ts": pd.to_datetime([t for _, t, _ in right], unit="s"),
        "payload": pd.Series([p for _, _, p in right], dtype="int64"),
    })
    if len(rpd):
        rpd = (
            rpd.groupby(["user_id", "ts"], as_index=False)["payload"]
            .max()
            .sort_values("ts", kind="mergesort")
        )
    expected = pd.merge_asof(
        lpd, rpd.rename(columns={"payload": "r_payload"}),
        on="ts", by="user_id", direction="backward",
    )
    for _, row in expected.iterrows():
        want = (
            None if pd.isna(row["r_payload"]) else int(row["r_payload"])
        )
        assert got[row["event_id"]] == want, (row["event_id"],)


# ---------------------------------------------------------------------------
# span_dedup vs a pure-Python reference on random corpora
# ---------------------------------------------------------------------------


def _py_span_dedup(docs: list[tuple[int, str]], n: int):
    """Reference implementation of the first-global-occurrence rule."""
    seen: dict[str, tuple[int, int]] = {}
    spans_of = {}
    for doc_id, text in docs:
        w = text.split()
        spans = [
            " ".join(w[s * n:(s + 1) * n])
            for s in range((len(w) + n - 1) // n)
        ]
        spans_of[doc_id] = spans
        for pos, sp in enumerate(spans):
            if sp not in seen or (doc_id, pos) < seen[sp]:
                seen[sp] = (doc_id, pos)
    out = {}
    for doc_id, spans in spans_of.items():
        kept = [
            sp
            for pos, sp in enumerate(spans)
            if seen[sp] == (doc_id, pos)
        ]
        out[doc_id] = (len(spans), len(kept), " ".join(kept))
    return out


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "dd"]), min_size=0, max_size=12
        ),
        min_size=1,
        max_size=8,
    ),
    n=st.integers(1, 4),
)
@settings(**_SETTINGS)
def test_span_dedup_matches_python_reference(spark, texts, n):
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.dedup import (
        span_dedup,
    )

    docs = [(i, " ".join(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_spans, r.n_kept, r.clean_text)
        for r in span_dedup(df, n=n).collect()
    }
    assert got == _py_span_dedup(docs, n)


# ---------------------------------------------------------------------------
# epoch_upsample: exact expected copy counts from the hash rule
# ---------------------------------------------------------------------------


@given(
    rates=st.lists(
        st.floats(-1.0, 4.0, allow_nan=False, width=32),
        min_size=1,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_epoch_upsample_matches_hash_rule(spark, rates):
    import hashlib

    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.sampling import (
        epoch_upsample,
    )

    rows = [(i, float(r)) for i, r in enumerate(rates)]
    df = spark.createDataFrame(rows, "doc_id long, rate double")
    got = {
        r.doc_id: r.n
        for r in epoch_upsample(df, "rate", "doc_id")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    import math

    for i, r in rows:
        rr = max(r, 0.0)
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        want = int(math.floor(rr)) + (
            1 if u < (rr - math.floor(rr)) * 4294967296.0 else 0
        )
        assert got.get(i, 0) == want, (i, r)
