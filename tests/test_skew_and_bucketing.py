"""Skew mitigation (salted join, two-stage agg) and bucketed co-located
joins: results must equal the plain operators, and the bucketed join
plan must contain no Exchange (the shuffle was paid at write time)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.skew import (
    salted_join,
    two_stage_agg,
    with_salt,
    write_bucketed,
)

from conftest import SF_SMOKE


def _skewed(spark):
    # key 0 is hot: 5000 rows; keys 1..49 have 10 each
    hot = spark.range(5000).select(
        F.lit(0).alias("k"), (F.col("id") % 97).alias("v")
    )
    cold = spark.range(500).select(
        (F.col("id") % 49 + 1).alias("k"), (F.col("id") % 97).alias("v")
    )
    return hot.unionByName(cold)


def test_with_salt_deterministic_and_bounded(spark):
    df = _skewed(spark)
    a = with_salt(df, 8).groupBy("_salt").count()
    assert a.count() == 8
    # deterministic: same content -> same salt on recompute
    b = with_salt(df, 8).groupBy("_salt").count()
    assert {(r["_salt"], r["count"]) for r in a.collect()} == {
        (r["_salt"], r["count"]) for r in b.collect()
    }


def test_salted_join_matches_plain_join(spark):
    left = _skewed(spark)
    right = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("r")
    )
    plain = left.join(right, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("r").alias("s")
    )
    salted = salted_join(left, right, "k", n_salts=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("r").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "l"])
    right = spark.createDataFrame([(1, "x"), (1, "y")], ["k", "r"])
    got = sorted(
        map(tuple, salted_join(left, right, "k", n_salts=4, how="left").collect())
    )
    assert got == [(1, "a", "x"), (1, "a", "y"), (2, "b", None), (3, "c", None)]


def test_two_stage_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    staged = two_stage_agg(
        df,
        ["k"],
        {
            "n": ("count", F.lit(1)),
            "s": ("sum", "v"),
            "lo": ("min", "v"),
            "hi": ("max", "v"),
        },
        n_salts=8,
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, staged.select("k", "n", "s", "lo", "hi").collect())
    )


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    try:
        write_bucketed(
            orders, "b_orders", "o_orderkey", 8, sort_cols="o_orderkey"
        )
        write_bucketed(
            lineitem, "b_lineitem", "l_orderkey", 8, sort_cols="l_orderkey"
        )
        joined = (
            spark.table("b_lineitem")
            .join(
                spark.table("b_orders").hint("merge"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .select("l_orderkey", "o_custkey", "l_quantity")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        expected = lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_detect_skew_ranks_hot_keys(spark):
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.skew import (
        detect_skew,
    )

    rows = [("hot",)] * 900 + [(f"k{i}",) for i in range(100)]
    df = spark.createDataFrame(rows, "k string")
    top = detect_skew(df, "k", top_n=3).collect()
    assert top[0]["k"] == "hot" and top[0]["n_rows"] == 900
    assert top[0]["share"] == pytest.approx(0.9)
    # mean key load = 1000/101 rows; hot is ~90x the mean
    assert top[0]["x_mean"] == pytest.approx(900 / (1000 / 101))
    assert all(r["n_rows"] == 1 for r in top[1:])


def test_split_skew_join_equals_plain_join(spark):
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.skew import (
        split_skew_join,
    )

    left = spark.createDataFrame(
        [("hot", i) for i in range(500)]
        + [(f"k{i}", i) for i in range(50)]
        + [(None, -1), ("orphan", -2)],
        "k string, lv long",
    )
    right = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"R{i}") for i in range(40)],
        "k string, rv string",
    )
    for how in ("inner", "left"):
        plain = {(r["k"], r["lv"], r["rv"])
                 for r in left.join(right, "k", how).collect()}
        split = {(r["k"], r["lv"], r["rv"])
                 for r in split_skew_join(left, right, "k",
                                          ["hot"], how).collect()}
        assert split == plain, how
    # hot branch really is a broadcast join
    plan = split_skew_join(left, right, "k", ["hot"])._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    import pytest as _pt

    with _pt.raises(ValueError, match="inner/left"):
        split_skew_join(left, right, "k", ["hot"], "full")


def test_runtime_bloom_filter_join_pruning(spark):
    """Spark's runtime bloom-filter join pruning engages on this
    runtime: when the dim side is too big to broadcast (forced here by
    disabling broadcast in an ISOLATED newSession — same JVM,
    independent SQL conf), the fact scan gets a might_contain filter
    fed by a bloom_filter_agg over the dim keys, row-filtering the
    fact side before the shuffle. At 100 TB this is the automatic
    complement to DPP for non-partition join keys."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold", "1KB"
    )
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    o = s2.read.parquet(f"{SF_SMOKE}/orders.parquet")
    c = s2.read.parquet(f"{SF_SMOKE}/customer.parquet").where(
        F.col("c_acctbal") > 9000
    )
    j = o.join(c, o.o_custkey == c.c_custkey).groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        j.explain(True)
    plan = buf.getvalue()
    assert "might_contain" in plan and "bloom_filter_agg" in plan
    # semantics unchanged: bloom is a pre-filter, never a decider
    base = {
        (r.c_mktsegment, r.n)
        for r in o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {(r.c_mktsegment, r.n) for r in j.collect()} == base
