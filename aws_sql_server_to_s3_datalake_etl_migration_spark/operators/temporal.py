"""Temporal joins Spark lacks as built-ins: as-of join and range
(interval) join, in shuffle-safe formulations.

A naive inequality join (``l.user = r.user AND r.ts <= l.ts``) plans as
a broadcast-nested-loop or cartesian — O(n·m) and a scale killer. Both
operators here reduce to equi-shuffles:

- ``asof_join``: union-tag + per-key ordered window. One shuffle on the
  join key, one sort within partitions; ``last(payload, ignorenulls)``
  carries the most recent right-side row forward onto each left row.
  O((n+m) log(n+m)) per key group, no pair blowup — the standard
  time-series formulation (kdb's aj, pandas merge_asof) expressed in
  Spark windows.
- ``range_join``: bucket both sides into window-sized bins, equi-join
  on (key, bin) with the left side expanded to the two bins its
  interval can touch, then filter to the exact range. Shuffle volume is
  O(n + m + true matches) — the bin join only pairs rows within one
  window of each other.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# "<n> <unit>" — the only tolerance shape asof_join splices into
# F.expr(f"INTERVAL ...").
_TOLERANCE_RE = re.compile(
    r"\s*\d+\s+"
    r"(microsecond|millisecond|second|minute|hour|day|week)s?\s*",
    re.IGNORECASE,
)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_ts_out: str = "matched_ts",
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """For every left row, attach the nearest right-side ``ts_col`` of
    the same ``on`` key — the greatest ``right.ts <= left.ts``
    (``direction="backward"``, inclusive) or the smallest
    ``right.ts >= left.ts`` (``"forward"``). Left rows with no match
    keep NULL; ``tolerance`` (an SQL interval string, e.g.
    ``"1 hour"``) additionally nulls matches farther than that from
    the left timestamp — pandas ``merge_asof`` semantics.

    The right side is first reduced to distinct (key, ts) — the as-of
    answer is a timestamp, so duplicates at the same instant are one
    match and tie semantics stay engine-independent. Returns all left
    columns plus ``right_ts_out``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    if tolerance is not None and not _TOLERANCE_RE.fullmatch(tolerance):
        # tolerance is spliced into F.expr(f"INTERVAL {tolerance}") below;
        # reject anything but "<n> <unit>" here so a malformed value (or
        # an arbitrary expression) fails loudly at the call site instead
        # of as a cryptic parse error inside Catalyst.
        raise ValueError(
            f"tolerance must look like '<n> <unit>' (e.g. '1 hour', "
            f"'90 seconds'): {tolerance!r}"
        )
    r = (
        right.select(F.col(on), F.col(ts_col))
        .distinct()
        .withColumn("_side", F.lit(0))
        .withColumn("_r_ts", F.col(ts_col))
    )
    l = left.withColumn("_side", F.lit(1)).withColumn(
        "_r_ts", F.lit(None).cast(right.schema[ts_col].dataType)
    )
    cols = [on, ts_col, "_side", "_r_ts"]
    extra = [c for c in left.columns if c not in (on, ts_col)]
    unioned = l.select(*cols, *extra).unionByName(
        r.select(*cols, *[F.lit(None).alias(c) for c in extra]),
        allowMissingColumns=False,
    )
    # Right rows sort BEFORE left rows at equal ts (side 0 < 1), making
    # the match inclusive; the running last() then carries the newest
    # right ts forward within each key. Forward as-of is the same scan
    # in reverse time order.
    ts_order = (
        F.col(ts_col).asc() if direction == "backward"
        else F.col(ts_col).desc()
    )
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        unioned.withColumn(
            right_ts_out, F.last("_r_ts", ignorenulls=True).over(w)
        )
        .where(F.col("_side") == 1)
        .select(*left.columns, right_ts_out)
    )
    if tolerance is not None:
        bound = F.expr(f"INTERVAL {tolerance}")
        in_tol = (
            F.col(right_ts_out) >= F.col(ts_col) - bound
            if direction == "backward"
            else F.col(right_ts_out) <= F.col(ts_col) + bound
        )
        out = out.withColumn(
            right_ts_out, F.when(in_tol, F.col(right_ts_out))
        )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    window_us: int = 300_000_000,
    count_out: str = "n_in_range",
) -> DataFrame:
    """Count, per left row, the right rows of the same key inside the
    half-open interval ``[left.ts - window, left.ts)``.

    Binning: both sides land in window-sized bins; a right row matching
    a left row can only sit in the left row's bin or the one before it,
    so the left side explodes to those two bins and the join is a plain
    equi-join on (key, bin) — never an inequality theta join. Left rows
    with no matches keep count 0 via the final left join.
    """
    bin_of = lambda c: F.floor(F.unix_micros(c) / F.lit(window_us))  # noqa: E731
    lk = left.select(
        F.col(on).alias("_k"),
        F.col(ts_col).alias("_lts"),
        F.unix_micros(ts_col).alias("_lus"),
        F.explode(
            F.array(bin_of(F.col(ts_col)) - 1, bin_of(F.col(ts_col)))
        ).alias("_bin"),
    )
    rk = right.select(
        F.col(on).alias("_k"),
        F.unix_micros(ts_col).alias("_rus"),
        bin_of(F.col(ts_col)).alias("_bin"),
    )
    counts = (
        lk.join(rk, ["_k", "_bin"])
        .where(
            (F.col("_rus") >= F.col("_lus") - F.lit(window_us))
            & (F.col("_rus") < F.col("_lus"))
        )
        .groupBy("_k", "_lts")
        .agg(F.count(F.lit(1)).alias(count_out))
    )
    return (
        left.join(
            counts,
            (F.col(on) == F.col("_k")) & (F.col(ts_col) == F.col("_lts")),
            "left",
        )
        .select(
            *left.columns,
            F.coalesce(count_out, F.lit(0)).cast("long").alias(count_out),
        )
    )


def asof_join_payload(
    left: DataFrame,
    right: DataFrame,
    on: str,
    payload_cols: Sequence[str],
    ts_col: str = "ts",
    right_ts_out: str = "matched_ts",
    out_prefix: str = "r_",
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """``asof_join`` that also ATTACHES right-side payload columns —
    the full pandas ``merge_asof`` / kdb ``aj`` shape (the ts-only
    variant answers "when was the last observation"; this one answers
    "what did it say").

    Same shuffle-safe formulation (union-tag + one per-key ordered
    window, no inequality join): the payload rides as ONE struct
    column so all attached fields come from the SAME matched right
    row atomically — per-column ``last(ignorenulls)`` carries would
    mix rows when a newer right row holds a NULL field. Right rows
    are first reduced to one per (key, ts) by lexicographic-max
    payload struct (deterministic, engine-independent tie rule; feed
    pre-aggregated series to make ties impossible). Attached columns
    come back as ``<out_prefix><payload_col>``, NULL (together with
    ``right_ts_out``) for unmatched or out-of-``tolerance`` rows.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    if tolerance is not None and not _TOLERANCE_RE.fullmatch(tolerance):
        raise ValueError(
            f"tolerance must look like '<n> <unit>' (e.g. '1 hour', "
            f"'90 seconds'): {tolerance!r}"
        )
    pay = list(payload_cols)
    missing = [c for c in pay if c not in right.columns]
    if missing:
        raise ValueError(f"payload_cols not in right side: {missing}")
    r = (
        right.groupBy(F.col(on), F.col(ts_col))
        .agg(F.max(F.struct(*[F.col(c) for c in pay])).alias("_pay"))
        .withColumn("_side", F.lit(0))
        .withColumn("_r_ts", F.col(ts_col))
    )
    pay_type = r.schema["_pay"].dataType
    l = (
        left.withColumn("_side", F.lit(1))
        .withColumn("_r_ts", F.lit(None).cast(right.schema[ts_col].dataType))
        .withColumn("_pay", F.lit(None).cast(pay_type))
    )
    cols = [on, ts_col, "_side", "_r_ts", "_pay"]
    extra = [c for c in left.columns if c not in (on, ts_col)]
    unioned = l.select(*cols, *extra).unionByName(
        r.select(*cols, *[F.lit(None).alias(c) for c in extra]),
        allowMissingColumns=False,
    )
    ts_order = (
        F.col(ts_col).asc() if direction == "backward"
        else F.col(ts_col).desc()
    )
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        unioned.withColumn(
            right_ts_out, F.last("_r_ts", ignorenulls=True).over(w)
        )
        .withColumn("_pay_c", F.last("_pay", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    if tolerance is not None:
        bound = F.expr(f"INTERVAL {tolerance}")
        in_tol = (
            F.col(right_ts_out) >= F.col(ts_col) - bound
            if direction == "backward"
            else F.col(right_ts_out) <= F.col(ts_col) + bound
        )
        carried = carried.withColumn(
            right_ts_out, F.when(in_tol, F.col(right_ts_out))
        ).withColumn("_pay_c", F.when(in_tol, F.col("_pay_c")))
    return carried.select(
        *left.columns,
        right_ts_out,
        *[
            F.col("_pay_c").getField(c).alias(f"{out_prefix}{c}")
            for c in pay
        ],
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_us: int = 3_600_000_000,
) -> DataFrame:
    """Join rows whose [start, end] intervals (inclusive, epoch-micros
    int64 columns) overlap — WITHOUT the O(n·m) theta join Spark would
    otherwise plan for an inequality condition.

    Binning: both sides explode onto fixed-width time bins covering
    their interval; two overlapping intervals necessarily share the
    bin containing the overlap's start, so an equi-join on the bin
    finds every overlapping pair, the exact predicate
    (``l_start <= r_end AND r_start <= l_end``) removes same-bin
    non-overlaps, and pairs meeting in several shared bins are
    deduplicated by keeping only the FIRST shared bin (a predicate —
    ``bin == max(floor(l_start/bin), floor(r_start/bin))`` — not a
    distinct, so no extra shuffle).

    Fan-out per row is interval_length/bin_us + 1: size ``bin_us``
    near the typical interval length (an hour for sessions, a day for
    campaigns). Cost is O(data x fan-out + true pairs) — the binned
    range-join strategy, same family as ``range_join``.
    """
    lb = left.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(l_start) / F.lit(bin_us)),
                F.floor(F.col(l_end) / F.lit(bin_us)),
            )
        ),
    )
    rb = right.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(r_start) / F.lit(bin_us)),
                F.floor(F.col(r_end) / F.lit(bin_us)),
            )
        ),
    )
    first_shared = F.greatest(
        F.floor(F.col(l_start) / F.lit(bin_us)),
        F.floor(F.col(r_start) / F.lit(bin_us)),
    )
    return (
        lb.join(rb, "_bin")
        .where(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (F.col("_bin") == first_shared)
        )
        .drop("_bin")
    )
