"""Watermark-delay advisor: how out-of-order is this stream, really?

Every watermark setting is a bet about lateness; this measures it.
``lateness_profile`` computes, for each record, how far its event time
lags the maximum event time seen so far in arrival order (the exact
quantity a Structured Streaming watermark trades off), then reduces it
to threshold exceedance counts and a suggested delay.

Scale shape — the naive formulation is a single global
``MAX(ts) OVER (ORDER BY arrival)`` window, which funnels the corpus
through one task. Here the prefix max uses the two-pass segment carry
(the pattern SCALING.md prescribes for few-key giant series):

1. arrival keys bucket into fixed-size chunks; the running max within
   each chunk is an ordinary partitioned window (parallel across
   chunks);
2. per-chunk maxima (|chunks| rows) get a running max in one tiny
   single-partition window;
3. the carry joins back by chunk id and ``greatest(carry,
   within-chunk running max)`` is the exact global prefix max.

The chunk size SELF-SCALES: it grows with n so the carry table stays
under ``target_carry_rows`` (default 64k) — a fixed chunk would make
the carry n/chunk rows, whose single-partition window and join-back
broadcast both break at 10^12-row corpora. The join-back carries no
broadcast hint; AQE broadcasts it while small and falls back to a
shuffle join otherwise.

Everything downstream is integer sums — engine-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# threshold name -> nanoseconds
DEFAULT_THRESHOLDS: tuple[tuple[str, int], ...] = (
    ("1 minute", 60 * 10**9),
    ("5 minutes", 5 * 60 * 10**9),
    ("15 minutes", 15 * 60 * 10**9),
    ("1 hour", 3600 * 10**9),
)


def _self_scaling_chunk(
    df: DataFrame,
    chunk: int,
    n_rows: int | None,
    target_carry_rows: int,
) -> int:
    """Chunk size that keeps the carry table (≈ n / chunk rows) under
    ``target_carry_rows`` at any n: max(chunk, ceil(n / target)).
    ``n_rows=None`` costs one count() job — pass the known row count
    (or any upper bound; a larger chunk only shrinks the carry) to
    skip it."""
    if n_rows is None:
        n_rows = df.count()
    return max(chunk, -(-int(n_rows) // target_carry_rows))


def with_lateness(
    df: DataFrame,
    ts_ns_col: str,
    arrival_col: str,
    chunk: int = 8192,
    n_rows: int | None = None,
    target_carry_rows: int = 65536,
) -> DataFrame:
    """Add ``lateness_ns``: prefix-max event time (in arrival order)
    minus own event time; 0 for in-order records. ``chunk`` is a
    FLOOR — the effective chunk grows so the carry stays under
    ``target_carry_rows`` (assumes ``arrival_col`` is roughly dense,
    which balanced chunks already required). Pass ``n_rows`` (or an
    upper bound on max(arrival)) to avoid the sizing count() job."""
    eff_chunk = _self_scaling_chunk(df, chunk, n_rows, target_carry_rows)
    cid = (F.col(arrival_col) / eff_chunk).cast("long").alias("_cid")
    d = df.withColumn("_cid", cid)
    w_in = (
        Window.partitionBy("_cid")
        .orderBy(arrival_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("_run_in", F.max(ts_ns_col).over(w_in))
    chunk_max = d.groupBy("_cid").agg(F.max(ts_ns_col).alias("_cmax"))
    w_carry = (
        Window.orderBy("_cid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = chunk_max.withColumn(
        "_carry", F.max("_cmax").over(w_carry)
    ).select("_cid", "_carry")
    # no broadcast hint: the carry is ≤ target_carry_rows by
    # construction, so AQE broadcasts it; an explicit hint would force
    # a driver OOM instead of a shuffle join if that bound is ever
    # defeated
    d = d.join(carry, "_cid")
    prefix_max = F.greatest(
        F.coalesce(F.col("_carry"), F.col("_run_in")), F.col("_run_in")
    )
    return d.withColumn(
        "lateness_ns", prefix_max - F.col(ts_ns_col)
    ).drop("_cid", "_run_in", "_carry")


def lateness_profile(
    df: DataFrame,
    ts_ns_col: str,
    arrival_col: str,
    chunk: int = 8192,
    thresholds: tuple[tuple[str, int], ...] = DEFAULT_THRESHOLDS,
    target_loss: float = 0.001,
    n_rows: int | None = None,
) -> DataFrame:
    """One-row lateness report: total records, exceedance count per
    threshold, max lateness (whole seconds), and the smallest
    threshold whose late fraction is ≤ ``target_loss`` as
    ``suggested_delay`` (null if none qualifies — the stream is too
    disordered for these thresholds)."""
    lat = with_lateness(df, ts_ns_col, arrival_col, chunk, n_rows=n_rows)
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_events")]
    for name, ns in thresholds:
        key = "n_late_gt_" + name.replace(" ", "_")
        aggs.append(
            F.sum(F.when(F.col("lateness_ns") > ns, 1).otherwise(0))
            .cast("long")
            .alias(key)
        )
    # integer DIV, not float divide + cast: double->long casts truncate
    # on Spark but round on some engines — integer division is
    # unambiguous everywhere
    aggs.append(
        F.expr("CAST(MAX(lateness_ns) DIV 1000000000 AS BIGINT)").alias(
            "max_lateness_sec"
        )
    )
    row = lat.agg(*aggs)
    suggestion = F.lit(None).cast("string")
    for name, _ns in reversed(thresholds):
        key = "n_late_gt_" + name.replace(" ", "_")
        ok = (F.col(key).cast("double") / F.col("n_events")) <= F.lit(
            float(target_loss)
        )
        suggestion = F.when(ok, F.lit(name)).otherwise(suggestion)
    return row.withColumn("suggested_delay", suggestion)
