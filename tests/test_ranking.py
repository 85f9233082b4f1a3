"""Distributed ordered-prefix operator vs the naive single-task window.

The operator's whole claim is bit-identical results with no global
single-task sort — so every test here computes the same quantity twice
(distributed vs ``Window.orderBy`` with no partitioning) and requires
exact equality, including on adversarial inputs: heavy value ties
(one value holding a large block of rows), NULL-bearing keys, a
single-row frame, and n < k NTILE splits.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.ranking import (
    ntile_expr,
    percent_rank_expr,
    with_ordered_prefix,
)


@pytest.fixture(scope="module")
def rank_df(spark):
    random.seed(41)
    rows = [
        (
            i,
            random.choice("abcd"),
            random.randint(0, 400) / 7.0,
            random.randint(1, 9),
        )
        for i in range(4000)
    ]
    # a heavy tie block: one value owning ~8% of rows (all in one
    # bucket by construction — the documented skew caveat)
    rows += [(10_000 + i, "e", 3.0, 2) for i in range(350)]
    return spark.createDataFrame(
        rows, "id long, grp string, v double, amt long"
    )


def test_global_position_cumsum_percentrank_ntile(rank_df):
    got = with_ordered_prefix(
        rank_df,
        "v",
        [F.col("v"), F.col("id")],
        {"pos": F.lit(1), "cum_amt": F.col("amt")},
        totals={"n_total": "pos"},
    ).select(
        "id",
        "pos",
        "cum_amt",
        percent_rank_expr(F.col("pos"), F.col("n_total")).alias("pr"),
        ntile_expr(F.col("pos"), F.col("n_total"), 5).alias("t5"),
        ntile_expr(F.col("pos"), F.col("n_total"), 7).alias("t7"),
    )
    w = Window.orderBy("v", "id")
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = rank_df.select(
        "id",
        F.row_number().over(w).alias("pos"),
        F.sum("amt").over(wr).alias("cum_amt"),
        F.percent_rank().over(w).alias("pr"),
        F.ntile(5).over(w).cast("bigint").alias("t5"),
        F.ntile(7).over(w).cast("bigint").alias("t7"),
    )
    a = {r["id"]: r for r in got.collect()}
    b = {r["id"]: r for r in want.collect()}
    assert set(a) == set(b)
    for k, wr_ in b.items():
        for c in ("pos", "cum_amt", "pr", "t5", "t7"):
            assert a[k][c] == wr_[c], (k, c, a[k][c], wr_[c])


def test_partitioned_prefix_matches_partitioned_window(rank_df):
    got = with_ordered_prefix(
        rank_df,
        "v",
        [F.col("v"), F.col("id")],
        {"pos": F.lit(1)},
        partition_cols=["grp"],
        totals={"n_g": "pos"},
    ).select(
        "id",
        "pos",
        ntile_expr(F.col("pos"), F.col("n_g"), 3).alias("t3"),
    )
    wg = Window.partitionBy("grp").orderBy("v", "id")
    want = rank_df.select(
        "id",
        F.row_number().over(wg).alias("pos"),
        F.ntile(3).over(wg).cast("bigint").alias("t3"),
    )
    a = {r["id"]: (r["pos"], r["t3"]) for r in got.collect()}
    b = {r["id"]: (r["pos"], r["t3"]) for r in want.collect()}
    assert a == b


def test_descending_via_negation(rank_df):
    got = with_ordered_prefix(
        rank_df.withColumn("_neg", -F.col("v")),
        "_neg",
        [F.col("_neg"), F.col("id")],
        {"pos": F.lit(1)},
    ).select("id", "pos")
    w = Window.orderBy(F.col("v").desc(), F.col("id"))
    want = rank_df.select("id", F.row_number().over(w).alias("pos"))
    a = {r["id"]: r["pos"] for r in got.collect()}
    b = {r["id"]: r["pos"] for r in want.collect()}
    assert a == b


def test_single_row_and_small_n(spark):
    one = spark.createDataFrame([(1, 5.0)], "id long, v double")
    row = (
        with_ordered_prefix(
            one,
            "v",
            [F.col("v"), F.col("id")],
            {"pos": F.lit(1)},
            totals={"n": "pos"},
        )
        .select(
            percent_rank_expr(F.col("pos"), F.col("n")).alias("pr"),
            ntile_expr(F.col("pos"), F.col("n"), 5).alias("t"),
        )
        .collect()[0]
    )
    assert row["pr"] == 0.0 and row["t"] == 1
    # n < k: NTILE(5) over 3 rows -> tiles 1,2,3
    three = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0)], "id long, v double"
    )
    got = (
        with_ordered_prefix(
            three,
            "v",
            [F.col("v"), F.col("id")],
            {"pos": F.lit(1)},
            totals={"n": "pos"},
        )
        .select("id", ntile_expr(F.col("pos"), F.col("n"), 5).alias("t"))
        .collect()
    )
    assert {r["id"]: r["t"] for r in got} == {1: 1, 2: 2, 3: 3}


def test_nulls_first_matches_window(spark):
    rows = [(i, None if i % 7 == 0 else float(i % 13)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = with_ordered_prefix(
        df, "v", [F.col("v"), F.col("id")], {"pos": F.lit(1)}
    ).select("id", "pos")
    w = Window.orderBy("v", "id")
    want = df.select("id", F.row_number().over(w).alias("pos"))
    a = {r["id"]: r["pos"] for r in got.collect()}
    b = {r["id"]: r["pos"] for r in want.collect()}
    assert a == b


def test_no_unpartitioned_window_over_input_rows(rank_df):
    """The physical plan's only unpartitioned window must run over the
    tiny bucket-carry aggregate, never the input rows: the in-bucket
    window is partitioned, so the plan contains exactly one
    unpartitioned WindowExec and its child aggregates by bucket id."""
    out = with_ordered_prefix(
        rank_df, "v", [F.col("v"), F.col("id")], {"pos": F.lit(1)}
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the in-bucket window is partitioned by _opx_bkt
    assert "partitionspec=[_opx_bkt" in plan.lower().replace(" ", "") or (
        "_opx_bkt" in plan
    )


# ---------------------------------------------------------------------------
# group_order_statistics (round 10): bucket-locate exact percentiles
# ---------------------------------------------------------------------------


def _naive_order_stat(rows, probs):
    """(group, value, tiebreak) rows -> {(group, p): (n, value)} via a
    full in-memory sort — the definitional baseline."""
    import math
    from collections import defaultdict

    by_g = defaultdict(list)
    for g, v, t in rows:
        by_g[g].append((v, t))
    out = {}
    for g, vals in by_g.items():
        vals.sort()
        n = len(vals)
        for p in probs:
            k = max(math.ceil(p * n), 1)
            out[(g, p)] = (n, vals[k - 1][0])
    return out


def test_group_order_statistics_matches_naive_sort(spark):
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.ranking import (
        group_order_statistics,
    )

    random.seed(7)
    # heavy ties (values drawn from a small domain) force tie-break
    # selection inside one bucket; two groups of very different sizes
    rows = [
        ("a", float(random.randrange(10)), i) for i in range(503)
    ] + [("b", float(random.randrange(1000)), i) for i in range(57)]
    df = spark.createDataFrame(rows, "g string, v double, id long")
    probs = [0.5, 0.95, 0.99, 1.0]
    got = {
        (r["g"], r["prob"]): (r["n"], r["value"])
        for r in group_order_statistics(
            df, "v", probs, ["g"], ["id"], n_buckets=4
        ).collect()
    }
    assert got == _naive_order_stat(rows, probs)


def test_group_order_statistics_multiple_probs_one_bucket(spark):
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.ranking import (
        group_order_statistics,
    )

    # constant values: every row lands in ONE bucket, and all probs
    # resolve inside it (duplicate-join + per-prob window partition)
    rows = [("a", 5.0, i) for i in range(20)]
    df = spark.createDataFrame(rows, "g string, v double, id long")
    got = group_order_statistics(
        df, "v", [0.25, 0.75], ["g"], ["id"], n_buckets=8
    ).collect()
    assert {(r["prob"], r["n"], r["value"]) for r in got} == {
        (0.25, 20, 5.0),
        (0.75, 20, 5.0),
    }


def test_group_order_statistics_rejects_bad_probs(spark):
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.ranking import (
        group_order_statistics,
    )

    df = spark.createDataFrame([("a", 1.0, 1)], "g string, v double, id long")
    with pytest.raises(ValueError):
        group_order_statistics(df, "v", [0.0], ["g"], ["id"])
    with pytest.raises(ValueError):
        group_order_statistics(df, "v", [], ["g"], ["id"])


def test_group_rank_statistics_integer_formulas(spark):
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.ranking import (
        group_rank_statistics,
    )

    random.seed(11)
    rows = [("s", float(random.randrange(50)), i) for i in range(97)]
    df = spark.createDataFrame(rows, "g string, v double, id long")
    got = {
        r["stat"]: (r["n"], r["value"])
        for r in group_rank_statistics(
            df,
            "v",
            {
                "p10": lambda n: (n + 9) // 10,
                "p90": lambda n: (9 * n + 9) // 10,
            },
            ["g"],
            ["id"],
            n_buckets=4,
        ).collect()
    }
    vals = sorted(v for _, v, _ in rows)
    n = len(vals)
    assert got == {
        "p10": (n, vals[(n + 9) // 10 - 1]),
        "p90": (n, vals[(9 * n + 9) // 10 - 1]),
    }


def test_with_ordered_lead_matches_window(spark):
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.ranking import (
        with_ordered_lead,
    )

    random.seed(13)
    rows = []
    for i in range(400):
        g = "g" + str(i % 3)
        # value ties + a NULLABLE payload column: a successor whose
        # payload is NULL must surface as NULL, not as the bucket
        # carry (the presence-struct contract)
        payload = None if i % 7 == 0 else i * 11
        rows.append((g, float(i % 25), i, payload))
    df = spark.createDataFrame(
        rows, "g string, v double, id long, payload long"
    )
    w = Window.partitionBy("g").orderBy("v", "id")
    want = {
        (r["g"], r["id"]): (r["lp"], r["lid"])
        for r in df.select(
            "g",
            "id",
            F.lead("payload").over(w).alias("lp"),
            F.lead("id").over(w).alias("lid"),
        ).collect()
    }
    got_df = with_ordered_lead(
        df,
        "v",
        [F.col("v"), F.col("id")],
        {"lead_payload": "payload", "lead_id": "id"},
        partition_cols=["g"],
        n_buckets=4,
    )
    got = {
        (r["g"], r["id"]): (r["lead_payload"], r["lead_id"])
        for r in got_df.collect()
    }
    assert got == want
    # and the plan never ran an unpartitioned or per-group-only
    # window over the data: every WindowExec partitions by the
    # bucket too
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan


def test_with_ordered_lead_global_order(spark):
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.ranking import (
        with_ordered_lead,
    )

    df = spark.createDataFrame(
        [(float(v), i) for i, v in enumerate([5, 1, 3, 2, 4])],
        "v double, id long",
    )
    got = {
        r["id"]: r["nxt"]
        for r in with_ordered_lead(
            df, "v", [F.col("v"), F.col("id")], {"nxt": "id"},
            n_buckets=2,
        ).collect()
    }
    # ascending v order: 1(id1) 2(id3) 3(id2) 4(id4) 5(id0)
    assert got == {1: 3, 3: 2, 2: 4, 4: 0, 0: None}


def test_null_partition_groups_survive_all_operators(spark):
    """A NULL-valued partition key is a legal group (NULLS FIRST in
    the window ordering) — the carry/needed joins must be NULL-SAFE
    or every row of the NULL group silently vanishes."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.ranking import (
        group_order_statistics,
        with_ordered_lead,
        with_ordered_prefix,
    )

    rows = [(None if i % 3 == 0 else "g" + str(i % 3), float(i % 7), i)
            for i in range(60)]
    df = spark.createDataFrame(rows, "g string, v double, id long")
    w = Window.partitionBy("g").orderBy("v", "id")

    # prefix: exact row_number per group, NULL group included
    got = {
        (r["g"], r["id"]): r["pos"]
        for r in with_ordered_prefix(
            df, "v", [F.col("v"), F.col("id")], {"pos": F.lit(1)},
            partition_cols=["g"], n_buckets=4,
        ).collect()
    }
    want = {
        (r["g"], r["id"]): r["rn"]
        for r in df.select(
            "g", "id", F.row_number().over(w).alias("rn")
        ).collect()
    }
    assert got == want  # 60 rows, 20 of them in the NULL group

    # lead: NULL group's successors intact
    got_lead = {
        (r["g"], r["id"]): r["nxt"]
        for r in with_ordered_lead(
            df, "v", [F.col("v"), F.col("id")], {"nxt": "id"},
            partition_cols=["g"], n_buckets=4,
        ).collect()
    }
    want_lead = {
        (r["g"], r["id"]): r["nxt"]
        for r in df.select(
            "g", "id", F.lead("id").over(w).alias("nxt")
        ).collect()
    }
    assert got_lead == want_lead

    # bucket-locate: the NULL group reports its own order statistic
    stats = {
        r["g"]: r["value"]
        for r in group_order_statistics(
            df, "v", [0.5], ["g"], ["id"], n_buckets=4
        ).collect()
    }
    assert None in stats and len(stats) == 3


def test_bucket_locate_high_cardinality_groups_in_engine(spark):
    """Round-11 red/green for the in-engine locate: pre-rewrite, the
    (group, bucket) counts collected to the driver, so a partition
    key tracking the fact table meant a silent multi-GB collect (the
    bounded-group contract lived only in the docstring). The locate
    now runs as a ≤n_buckets-row-per-group window, so a per-id key
    is a first-class citizen — verified exact against the naive
    per-group sort, and the plan is asserted collect-free by
    construction (the operator returns before any action runs)."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.ranking import (
        group_order_statistics,
        group_rank_statistics,
    )

    random.seed(23)
    # 400 distinct groups of ragged sizes 1..8 — cardinality tracks
    # the input, the exact shape the old contract forbade
    rows = []
    for g in range(400):
        for i in range(1 + (g * 7 + 3) % 8):
            rows.append((f"u{g}", float(random.randrange(100)), i))
    df = spark.createDataFrame(rows, "g string, v double, id long")

    got = {
        (r["g"], r["prob"]): (r["n"], r["value"])
        for r in group_order_statistics(
            df, "v", [0.5, 0.9], ["g"], ["id"], n_buckets=8,
            broadcast_needed=False,
        ).collect()
    }
    assert got == _naive_order_stat(rows, [0.5, 0.9])
    assert len(got) == 2 * 400

    # integer-rank variant on the same high-cardinality key: the
    # Python lambda's arithmetic runs in-engine via the int64 proxy
    med = {
        r["g"]: (r["n"], r["value"])
        for r in group_rank_statistics(
            df, "v", {"med": lambda n: (n + 1) // 2}, ["g"], ["id"],
            n_buckets=8, broadcast_needed=False,
        ).collect()
    }
    from collections import defaultdict

    by_g = defaultdict(list)
    for g, v, t in rows:
        by_g[g].append((v, t))
    for g, vals in by_g.items():
        vals.sort()
        n = len(vals)
        assert med[g] == (n, vals[(n + 1) // 2 - 1][0])
    assert len(med) == 400


def test_group_order_statistics_rejects_duplicate_probs(spark):
    """ADVICE r10: a duplicate p adds a second identical needed-list
    row for its (group, bucket, label), doubling every joined row in
    that window partition and silently shifting the selected order
    statistic — reject loudly instead."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.ranking import (
        group_order_statistics,
    )

    df = spark.createDataFrame(
        [("a", 1.0, 1)], "g string, v double, id long"
    )
    with pytest.raises(ValueError, match="duplicate probs"):
        group_order_statistics(df, "v", [0.5, 0.5], ["g"], ["id"])


def test_bucket_locate_shuffle_needed_list_has_no_broadcast(spark):
    """broadcast_needed=False must leave NO broadcast hint in the
    analyzed plan — at 100 TB a |groups|-row needed-list broadcast is
    exactly what the dial exists to prevent (plan-level red/green for
    the r11 in-engine locate)."""
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.ranking import (
        group_order_statistics,
    )

    df = spark.createDataFrame(
        [(f"g{i % 50}", float(i % 13), i) for i in range(400)],
        "g string, v double, id long",
    )
    with_b = group_order_statistics(
        df, "v", [0.5], ["g"], ["id"], n_buckets=8
    )
    without_b = group_order_statistics(
        df, "v", [0.5], ["g"], ["id"], n_buckets=8,
        broadcast_needed=False,
    )
    plan_with = with_b._jdf.queryExecution().analyzed().toString()
    plan_without = without_b._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" in plan_with
    assert "ResolvedHint" not in plan_without
    # both variants must select identical order statistics
    rows = lambda d: sorted(
        (r["g"], r["prob"], r["n"], r["value"]) for r in d.collect()
    )
    assert rows(with_b) == rows(without_b)
