"""Skew mitigation and co-located (shuffle-free) joins.

The reference never handles skew — its biggest join is a dim lookup
(``table_jobs/nis_policies.py:24-25``). At 100 TB a handful of hot keys
(one giant customer, one default date) can put 100× the median load on
one reduce task and stall the stage. Two standing mitigations live
here, alongside AQE's runtime skew-join splitting (enabled in the
session factory):

- **Salted join**: fan each hot left-side key out across ``salt``
  sub-keys and replicate the matching right-side rows once per sub-key.
  Correct for any equi-join where the right side is the smaller/
  replicable side.
- **Two-stage (partial/final) aggregation**: pre-aggregate on
  (key, salt) so no single reducer sees a whole hot key, then combine.
  Valid for algebraic aggregates (count/sum/min/max).

Bucketed tables (``write_bucketed``/co-located reads) remove the
shuffle from repeated big-big joins entirely: both sides are
pre-hash-partitioned on the join key at write time, so Catalyst plans a
SortMergeJoin with no Exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic per-row salt in [0, n_salts): a content hash, not
    ``rand()``, so retried/recomputed tasks produce identical rows
    (non-determinism inside a shuffle breaks Spark's recompute-on-
    failure contract)."""
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).cast("int"),
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys on the (large) left side.

    Left rows get a deterministic salt; the right side is replicated
    ``n_salts`` times (explode over the salt range), so each (key, salt)
    shuffle bucket holds ~1/n of a hot key's rows. Output columns match
    a plain ``left.join(right, on, how)``.

    Cost model: replicates the right side n_salts×, so use when
    |right| * n_salts ≪ |left|'s hot-key imbalance. For dim-sized right
    sides prefer ``F.broadcast`` (no shuffle at all); this is for
    mid-sized right tables above the broadcast threshold.
    """
    keys = [on] if isinstance(on, str) else list(on)
    salted_left = with_salt(left, n_salts)
    salt_values = F.array(*[F.lit(i) for i in range(n_salts)])
    salted_right = right.withColumn("_salt", F.explode(salt_values))
    out = salted_left.join(salted_right, [*keys, "_salt"], how)
    return out.drop("_salt")


_PARTIAL = {
    "count": (lambda c: F.count(c), lambda n: F.sum(n)),
    "sum": (lambda c: F.sum(c), lambda n: F.sum(n)),
    "min": (lambda c: F.min(c), lambda n: F.min(n)),
    "max": (lambda c: F.max(c), lambda n: F.max(n)),
}


def two_stage_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str | Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Hot-key-safe grouped aggregation for algebraic aggregates.

    ``aggs`` maps output column name -> ("count"|"sum"|"min"|"max",
    input column). Stage 1 groups by (group_cols, salt) so each hot key
    spreads over ``n_salts`` reduce tasks; stage 2 re-combines partials
    per key (counts/sums are summed, min/max re-min/maxed).

    Note Spark's hash aggregate already does map-side partials; this
    helps the *reduce* side, where one key otherwise lands on one task.
    """
    for name, (kind, _) in aggs.items():
        if kind not in _PARTIAL:
            raise ValueError(f"{name}: non-algebraic aggregate {kind!r}")
    stage1 = (
        with_salt(df, n_salts)
        .groupBy(*group_cols, "_salt")
        .agg(
            *[
                _PARTIAL[kind][0](col).alias(name)
                for name, (kind, col) in aggs.items()
            ]
        )
    )
    return stage1.groupBy(*group_cols).agg(
        *[
            _PARTIAL[kind][1](name).alias(name)
            for name, (kind, _) in aggs.items()
        ]
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: str | list[str],
    n_buckets: int = 32,
    sort_cols: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table hash-bucketed (and optionally sorted) on its join
    key. Two tables bucketed the same way join with **zero Exchange**
    (and zero Sort, if sorted): the shuffle was paid once at write time
    and amortizes over every subsequent join — the right call for fact
    tables joined repeatedly on the same key at 100 TB.
    """
    bucket_cols = (
        [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    )
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        sort_cols = (
            [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        )
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def detect_skew(
    df: DataFrame,
    key_cols: str | list[str],
    top_n: int = 20,
) -> DataFrame:
    """Key-frequency skew report: the ``top_n`` heaviest keys with
    their share of all rows and ratio to the mean key load — the
    numbers that decide between AQE-only, salting, and hot-key
    isolation. One hash agg over the scan plus two single-row
    aggregates of the (small) per-key table; the per-key table is
    never collected."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = per_key.agg(
        F.sum("n_rows").alias("_total"),
        F.count(F.lit(1)).alias("_n_keys"),
    )
    return (
        per_key.crossJoin(F.broadcast(totals))
        .withColumn(
            "share", F.col("n_rows").cast("double") / F.col("_total")
        )
        .withColumn(
            "x_mean",
            F.col("n_rows").cast("double")
            / (F.col("_total").cast("double") / F.col("_n_keys")),
        )
        .drop("_total", "_n_keys")
        .orderBy(F.col("n_rows").desc(), *[F.col(k).asc() for k in keys])
        .limit(top_n)
    )


def split_skew_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    hot_keys: list,
    how: str = "inner",
) -> DataFrame:
    """Hot-key isolation join: rows with a known-hot key join via a
    BROADCAST of the right side's hot slice (hot keys never shuffle at
    all), everything else takes the normal equi-join path; the union
    of both branches is exactly the plain join (differential-tested).

    Use when ``detect_skew`` shows a few keys dominating: unlike
    salting, the hot path costs no replication factor, and unlike AQE
    splitting it also avoids shuffling the hot LEFT rows. ``hot_keys``
    must be small enough that the right side's hot slice broadcasts.
    Inner and left joins are supported (the split is not valid for
    right/full outer: an unmatched right hot row must surface exactly
    once, which the two-branch union can't guarantee)."""
    if how not in ("inner", "left"):
        raise ValueError("split_skew_join supports inner/left only")
    is_hot = F.col(on).isin(hot_keys)
    hot = left.where(is_hot).join(
        F.broadcast(right.where(is_hot)), on, how
    )
    cold = left.where(~is_hot | F.col(on).isNull()).join(
        right.where(~is_hot), on, how
    )
    return hot.unionByName(cold)
