"""Operator-level invariants for the round-8 analytics additions:
skyline (frontier.py), autocorrelation, weighted median, Benford —
the properties the DuckDB oracle can't state (pre-filter soundness
against a naive reference, closed-form statistical ground truth)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.frontier import (
    skyline_2d,
)
from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.timeseries import (
    autocorrelation,
)
from conftest import SF_SMOKE


def _naive_skyline(points):
    """O(n²) reference: maximize both dims, dominance needs one strict."""
    out = []
    for i, (xi, yi) in enumerate(points):
        dominated = any(
            (xj >= xi and yj >= yi and (xj > xi or yj > yi))
            for j, (xj, yj) in enumerate(points)
            if j != i
        )
        if not dominated:
            out.append((xi, yi))
    return sorted(out)


@pytest.mark.parametrize("seed", [7, 21])
def test_skyline_matches_naive_reference(spark, seed):
    rng = np.random.default_rng(seed)
    pts = [
        (float(x), float(y))
        for x, y in zip(
            rng.integers(0, 50, 300), rng.integers(0, 50, 300)
        )
    ]
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], "id INT, x DOUBLE, y DOUBLE"
    )
    got = sorted(
        (r["x"], r["y"])
        for r in skyline_2d(df, "x", "y", n_buckets=8).collect()
    )
    assert got == _naive_skyline(pts)


def test_skyline_all_ties_survive(spark):
    # exact ties on both dims are mutually non-dominating
    df = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 5.0, 5.0), (3, 1.0, 1.0)],
        "id INT, x DOUBLE, y DOUBLE",
    )
    ids = sorted(r["id"] for r in skyline_2d(df, "x", "y").collect())
    assert ids == [1, 2]


def test_skyline_empty_and_single(spark):
    empty = spark.createDataFrame([], "id INT, x DOUBLE, y DOUBLE")
    assert skyline_2d(empty, "x", "y").count() == 0
    one = spark.createDataFrame([(1, 2.0, 3.0)], "id INT, x DOUBLE, y DOUBLE")
    assert skyline_2d(one, "x", "y").count() == 1


def test_autocorrelation_matches_numpy(spark):
    rng = np.random.default_rng(3)
    series = {"a": rng.integers(0, 100, 60), "b": rng.integers(0, 10, 40)}
    rows = [
        (g, int(i), int(v))
        for g, ys in series.items()
        for i, v in enumerate(ys)
    ]
    df = spark.createDataFrame(rows, "g STRING, t INT, y INT")
    got = {
        (r["g"], r["lag"]): r["acf"]
        for r in autocorrelation(df, "g", "t", "y", max_lag=3).collect()
    }
    for g, ys in series.items():
        for k in (1, 2, 3):
            a, b = ys[k:].astype(float), ys[:-k].astype(float)
            want = float(np.corrcoef(a, b)[0, 1])
            assert got[(g, k)] == pytest.approx(want, abs=1e-12), (g, k)


def test_autocorrelation_constant_series_is_null(spark):
    df = spark.createDataFrame(
        [("c", i, 5) for i in range(20)], "g STRING, t INT, y INT"
    )
    rows = autocorrelation(df, "g", "t", "y", max_lag=2).collect()
    assert rows and all(r["acf"] is None for r in rows)


def test_weighted_median_matches_numpy(spark):
    from aws_sql_server_to_s3_datalake_etl_migration_spark.workloads_analytics import (
        lineitem_weighted_median,
    )
    import duckdb

    got = {
        r["l_returnflag"]: r["weighted_median"]
        for r in lineitem_weighted_median(spark, SF_SMOKE).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT l_returnflag, l_extendedprice, l_quantity "
        f"FROM '{SF_SMOKE}/lineitem.parquet'"
    ).fetchall()
    by_flag: dict[str, list] = {}
    for flag, price, qty in rows:
        by_flag.setdefault(flag, []).append((price, qty))
    for flag, pts in by_flag.items():
        pts.sort()
        total = sum(q for _, q in pts)
        cum = 0.0
        for price, q in pts:
            cum += q
            if 2 * cum >= total:
                assert got[flag] == price, flag
                break


def test_benford_shares_sum_to_one(spark):
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.quality import (
        benford_profile,
    )

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    rows = benford_profile(orders, "o_totalprice").collect()
    assert sum(r["n_rows"] for r in rows) == orders.where(
        F.col("o_totalprice") >= 1
    ).count()
    assert sum(r["obs_share"] for r in rows) == pytest.approx(1.0)
    # expected shares are Benford by construction
    assert sum(r["exp_share"] for r in rows) <= 1.0 + 1e-12
    for r in rows:
        d = int(r["digit"])
        assert r["exp_share"] == pytest.approx(math.log10(1 + 1 / d))


def test_cross_correlation_matches_numpy_and_mirrors(spark):
    from aws_sql_server_to_s3_datalake_etl_migration_spark.operators.timeseries import (
        cross_correlation,
    )

    rng = np.random.default_rng(11)
    base = rng.integers(5, 50, 80)
    # b trails a by 2 steps plus noise -> xcf should peak near shift +2
    b = np.roll(base, 2) + rng.integers(0, 3, 80)
    rows = [("p", int(i), int(base[i]), int(b[i])) for i in range(80)]
    df = spark.createDataFrame(rows, "g STRING, t INT, a INT, b INT")
    got = {
        r["shift"]: r["xcf"]
        for r in cross_correlation(df, "g", "t", "a", "b", 3).collect()
    }
    for s in range(-3, 4):
        if s >= 0:
            aa, bb = base[: 80 - s], b[s:]
        else:
            aa, bb = base[-s:], b[: 80 + s]
        want = float(np.corrcoef(aa.astype(float), bb.astype(float))[0, 1])
        assert got[s] == pytest.approx(want, abs=1e-12), s
    assert max(got, key=lambda s: got[s]) == 2
    # mirror identity: swapping the series negates the shift axis
    swapped = {
        r["shift"]: r["xcf"]
        for r in cross_correlation(df, "g", "t", "b", "a", 3).collect()
    }
    for s in range(-3, 4):
        assert swapped[s] == pytest.approx(got[-s], abs=1e-12)


def test_histogram_partitions_all_rows(spark):
    from aws_sql_server_to_s3_datalake_etl_migration_spark.workloads_timeseries import (
        events_value_histogram,
    )

    rows = events_value_histogram(spark, SF_SMOKE).collect()
    from aws_sql_server_to_s3_datalake_etl_migration_spark.workloads import (
        _events,
    )

    total = _events(spark, SF_SMOKE).count()
    assert sum(r["n_events"] for r in rows) == total
    for r in rows:
        assert 0 <= r["bin"] <= 19
        assert r["bin_lo"] < r["bin_hi"]


def test_user_overlap_matches_python_sets(spark):
    import duckdb

    from aws_sql_server_to_s3_datalake_etl_migration_spark.workloads_timeseries import (
        events_user_overlap,
    )

    got = {
        (r["type_a"], r["type_b"]): (
            r["n_common"], r["n_users_a"], r["n_users_b"], r["jaccard"]
        )
        for r in events_user_overlap(spark, SF_SMOKE).collect()
    }
    con = duckdb.connect()
    pairs = con.execute(
        f"SELECT event_type, user_id FROM '{SF_SMOKE}/events.parquet'"
    ).fetchall()
    sets: dict[str, set] = {}
    for t, u in pairs:
        sets.setdefault(t, set()).add(u)
    types = sorted(sets)
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            inter = len(sets[ta] & sets[tb])
            if inter == 0:
                assert (ta, tb) not in got
                continue
            n_common, na, nb, jac = got[(ta, tb)]
            assert n_common == inter
            assert (na, nb) == (len(sets[ta]), len(sets[tb]))
            assert jac == pytest.approx(
                inter / len(sets[ta] | sets[tb])
            )


def test_order_streaks_matches_python(spark):
    import duckdb

    from aws_sql_server_to_s3_datalake_etl_migration_spark.workloads_analytics import (
        customer_order_streaks,
    )

    got = {
        r["o_custkey"]: (
            r["longest_streak"], r["n_active_months"], r["n_streaks"]
        )
        for r in customer_order_streaks(spark, SF_SMOKE).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_custkey, EXTRACT(YEAR FROM o_orderdate) * 12 "
        f"+ EXTRACT(MONTH FROM o_orderdate) "
        f"FROM '{SF_SMOKE}/orders.parquet'"
    ).fetchall()
    by_cust: dict[int, set] = {}
    for c, m in rows:
        by_cust.setdefault(c, set()).add(int(m))
    for c, months in by_cust.items():
        ms = sorted(months)
        streaks, cur = [], 1
        for prev, nxt in zip(ms, ms[1:]):
            if nxt == prev + 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        assert got[c] == (max(streaks), len(ms), len(streaks)), c


def test_pseudonymize_is_deterministic_and_masks(spark):
    from aws_sql_server_to_s3_datalake_etl_migration_spark.workloads_analytics import (
        customer_pseudonymize,
    )

    rows = customer_pseudonymize(spark, SF_SMOKE).collect()
    again = customer_pseudonymize(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    keys = [r["surrogate_key"] for r in rows]
    assert len(set(keys)) == len(keys)  # injective over custkeys
    for r in rows:
        assert len(r["surrogate_key"]) == 64
        assert set(r["name_masked"][1:]) <= {"*"}  # initial only
        assert r["balance_band"] in ("negative", "standard", "premium")


def test_multiformat_union_eras_are_disjoint_and_complete(spark):
    from aws_sql_server_to_s3_datalake_etl_migration_spark.workloads_analytics import (
        orders_multiformat_union,
    )

    got = orders_multiformat_union(spark, SF_SMOKE)
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    assert got.count() == orders.count()
    assert got.select("o_orderkey").distinct().count() == orders.count()
