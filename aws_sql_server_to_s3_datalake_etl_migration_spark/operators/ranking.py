"""Distributed exact ordered-prefix aggregates (global rank / running
sum / NTILE / PERCENT_RANK) without a single-task window.

The naive ``Window.orderBy(...)`` with no partitioning funnels EVERY
row through one task — fine for a 25-nation aggregate, fatal for a
per-user or per-customer aggregate whose cardinality tracks the fact
table (10^8–10^9 rows at 100 TB). This module computes the same exact
values with a three-step distributed plan:

1. **Bucket by value.** Approximate quantile boundaries of the primary
   sort column (one tiny collected aggregate, ~63 doubles) split the
   rows into ``n_buckets`` value ranges. Bucket assignment is a pure,
   deterministic function of the VALUE (count of boundaries below it),
   so it is monotone in the sort order and stable across recomputation
   — unlike ``spark_partition_id()`` after ``repartitionByRange``,
   whose sampled boundaries may differ between the two jobs that read
   the exchange.
2. **Local prefix.** An ordinary partitioned window per bucket computes
   the running aggregate within each bucket in parallel.
3. **Carry join.** Per-bucket totals (``n_buckets`` rows) get prefix
   sums in one tiny window, then broadcast-join back; global prefix =
   bucket carry + local running value.

Exactness: positions are integer counts and carries are sums of the
caller's exact types (use DECIMAL for money), so the result is
bit-identical to the single-task window — only the execution shape
changes. PERCENT_RANK and NTILE then derive from the exact position
and total by closed-form integer arithmetic (``percent_rank_expr``,
``ntile_expr``).

Skew caveat: rows whose primary value EQUALS a boundary-heavy value
all land in one bucket (assignment must be a function of the value).
Quantile boundaries adapt to any continuous skew; only a single value
holding >1/n_buckets of the corpus re-creates a hot task — still
bounded by that value's frequency, never the whole corpus.

Reference parity: the reference engine has no distributed-rank
operator (its scale ceiling is one Glue executor); this is the
100 TB-safe re-expression of the global ORDER BY windows its reports
would need.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "with_ordered_prefix",
    "quantile_boundaries",
    "group_order_statistics",
    "group_rank_statistics",
    "with_ordered_lead",
    "ntile_expr",
    "percent_rank_expr",
]


def _bucket_boundaries(
    df: DataFrame, primary: str, n_buckets: int
) -> list[float]:
    """Interior quantile boundaries of ``primary`` (sorted, deduped).
    One tiny collected aggregate — control-plane, bounded by
    ``n_buckets`` doubles."""
    if n_buckets < 2:
        return []
    probs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.agg(
        F.percentile_approx(
            F.col(primary).cast("double"), probs, 10_000
        ).alias("b")
    ).collect()[0]
    vals = row["b"] or []
    out: list[float] = []
    for v in vals:
        if v is not None and (not out or v > out[-1]):
            out.append(float(v))
    return out


def _bucket_expr(primary: str, boundaries: list[float]) -> Column:
    """Deterministic monotone bucket id: number of boundaries strictly
    below the value. NULLs sort first (bucket 0) to match Spark/ANSI
    NULLS FIRST ascending order."""
    col = F.col(primary).cast("double")
    if not boundaries:
        return F.lit(0)
    terms = [(col > F.lit(b)).cast("int") for b in boundaries]
    return F.coalesce(reduce(lambda a, b: a + b, terms), F.lit(0))


def quantile_boundaries(
    df: DataFrame, cols: list[str], n_buckets: int = 64
) -> dict[str, list[float]]:
    """Interior quantile boundaries for SEVERAL columns in ONE
    collected aggregate — callers running multiple ordered-prefix
    passes over the same frame (e.g. three NTILE orderings) pay one
    boundary job instead of one per pass."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.agg(
        *[
            F.percentile_approx(
                F.col(c).cast("double"), probs, 10_000
            ).alias(c)
            for c in cols
        ]
    ).collect()[0]
    out: dict[str, list[float]] = {}
    for c in cols:
        vals: list[float] = []
        for v in row[c] or []:
            if v is not None and (not vals or v > vals[-1]):
                vals.append(float(v))
        out[c] = vals
    return out


def _null_safe_join(
    d: DataFrame, small: DataFrame, keys: list[str], broadcast: bool
) -> DataFrame:
    """Inner-join ``small`` onto ``d`` with NULL-SAFE key equality.
    A plain column-list join uses SQL equality, where NULL != NULL —
    so rows in a NULL-valued partition group would silently VANISH
    from the operator's output (the single-task window these
    operators replace keeps them; NULLS FIRST is a legal group). The
    small side's keys are renamed before the condition so no
    ambiguous columns survive."""
    renamed = small
    for k in keys:
        renamed = renamed.withColumnRenamed(k, f"_nsj_{k}")
    cond = None
    for k in keys:
        term = d[k].eqNullSafe(renamed[f"_nsj_{k}"])
        cond = term if cond is None else (cond & term)
    out = d.join(
        F.broadcast(renamed) if broadcast else renamed, cond
    )
    return out.drop(*[f"_nsj_{k}" for k in keys])


def with_ordered_prefix(
    df: DataFrame,
    primary: str,
    order_cols: list[Column | str],
    aggs: dict[str, Column],
    *,
    partition_cols: list[str] | None = None,
    totals: dict[str, str] | None = None,
    n_buckets: int = 64,
    boundaries: list[float] | None = None,
    broadcast_carry: bool = True,
) -> DataFrame:
    """Add exact running-``sum`` columns under a total order, computed
    distributed (see module docstring for the plan shape).

    ``broadcast_carry=False`` swaps the carry broadcast for a plain
    equi-join on (partition_cols, bucket) — required when
    ``partition_cols`` cardinality is HIGH (the carry table is
    |groups| x n_buckets rows; broadcasting millions of carries would
    OOM the executors that the bucketing exists to protect).

    Parameters
    ----------
    primary:
        Numeric column that is the FIRST key of the sort order (after
        any ``partition_cols``); bucket boundaries come from its
        quantiles. For descending order pass a negated helper column.
    order_cols:
        The full within-bucket ordering (must start with ``primary``'s
        direction and end with a unique tie-break).
    aggs:
        ``output_name -> expression``: each becomes the exact running
        sum of the expression over the order, frame
        ROWS UNBOUNDED PRECEDING..CURRENT ROW. Use ``F.lit(1)`` for a
        1-based global row position.
    partition_cols:
        Optional PARTITION BY keys — the prefix restarts per group
        (boundaries stay global; monotonicity within each group still
        holds because bucket id is a function of the value).
    totals:
        ``output_name -> agg_name``: also attach the grand total of
        ``aggs[agg_name]`` per partition group (e.g. the ``n`` that
        PERCENT_RANK/NTILE need), from the same tiny carry aggregate.
    boundaries:
        Precomputed bucket boundaries (``quantile_boundaries``) —
        callers with several passes over one frame batch the boundary
        jobs. Any sorted list works; balance only affects speed,
        never values.
    """
    pcols = list(partition_cols or [])
    if boundaries is None:
        boundaries = _bucket_boundaries(df, primary, n_buckets)
    d = df.withColumn("_opx_bkt", _bucket_expr(primary, boundaries))

    w_in = Window.partitionBy(*pcols, "_opx_bkt").orderBy(
        *order_cols
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    for name, expr in aggs.items():
        d = d.withColumn(f"_opx_run_{name}", F.sum(expr).over(w_in))

    btot = d.groupBy(*pcols, "_opx_bkt").agg(
        *[
            F.sum(expr).alias(f"_opx_tot_{name}")
            for name, expr in aggs.items()
        ]
    )
    # Carries run over |groups| x n_buckets rows — tiny by
    # construction; the global-case carry window is deliberately
    # single-partition (a lit(0) partition key would be folded away
    # by Catalyst anyway). Queries built on this helper register on
    # the plan audit's bounded-global-window allowlist with this
    # bound as the reason.
    w_carry = Window.partitionBy(*pcols).orderBy(
        "_opx_bkt"
    ).rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.partitionBy(*pcols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    carry_cols: list[Column] = [F.col(c) for c in pcols] + [
        F.col("_opx_bkt")
    ]
    for name in aggs:
        carry_cols.append(
            F.sum(f"_opx_tot_{name}").over(w_carry).alias(
                f"_opx_off_{name}"
            )
        )
    for out_name, agg_name in (totals or {}).items():
        carry_cols.append(
            F.sum(f"_opx_tot_{agg_name}").over(w_all).alias(out_name)
        )
    carry = btot.select(*carry_cols)

    d = _null_safe_join(
        d, carry, pcols + ["_opx_bkt"], broadcast_carry
    )
    for name, expr in aggs.items():
        zero = F.lit(0).cast(
            dict(d.dtypes)[f"_opx_run_{name}"]
        )
        d = d.withColumn(
            name,
            F.coalesce(F.col(f"_opx_off_{name}"), zero)
            + F.col(f"_opx_run_{name}"),
        )
    drop = (
        ["_opx_bkt"]
        + [f"_opx_run_{n}" for n in aggs]
        + [f"_opx_off_{n}" for n in aggs]
    )
    return d.drop(*drop)


def percent_rank_expr(pos: Column, n: Column) -> Column:
    """Exact PERCENT_RANK from a 1-based position under a UNIQUE total
    order (no ties -> rank == position): ``(pos-1)/(n-1)``, 0.0 for a
    single row (the SQL-standard convention, avoiding 0/0)."""
    return F.when(n <= 1, F.lit(0.0)).otherwise(
        (pos - F.lit(1)).cast("double") / (n - F.lit(1)).cast("double")
    )


def ntile_expr(pos: Column, n: Column, k: int) -> Column:
    """Exact NTILE(k) tile for a 1-based position over ``n`` rows —
    the SQL-standard split: the first ``n % k`` tiles get
    ``n div k + 1`` rows, the rest ``n div k``. Pure integer
    arithmetic on the exact position, so it matches the window
    function bit-for-bit when the ordering is unique."""
    q = (n / F.lit(k)).cast("long")  # floor for non-negative n
    r = n - q * F.lit(k)
    big = r * (q + F.lit(1))  # rows covered by the (q+1)-sized tiles
    in_big = ((pos - F.lit(1)) / (q + F.lit(1))).cast("long") + F.lit(1)
    in_small = r + ((pos - big - F.lit(1)) / q).cast("long") + F.lit(1)
    return F.when(pos <= big, in_big).otherwise(in_small).cast("bigint")


def group_order_statistics(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    partition_cols: list[str],
    tiebreak_cols: list[str],
    n_buckets: int = 64,
    *,
    boundaries: list[float] | None = None,
    broadcast_needed: bool = True,
) -> DataFrame:
    """Exact per-group ORDER STATISTICS (the ceil(p·n)-th value under
    the (value, tiebreak) total order) WITHOUT sorting any group in
    one task — the bucket-locate plan:

    1. Quantile boundaries of ``value_col`` split rows into value
       buckets (monotone, deterministic — the ordered-prefix
       machinery above).
    2. A (group, bucket) count aggregate gets running/total counts
       over one BOUNDED window per group (≤ n_buckets rows each —
       the ``with_ordered_prefix`` carry shape; nothing is collected
       to the driver, so group cardinality may track the fact table).
    3. In-engine rank arithmetic locates, per (group, p), the bucket
       holding rank k = ceil(p·n) and the residual in-bucket rank.
    4. A join of that needed-list (one row per group × p) filters the
       data to the selected buckets only (~|probs|/n_buckets of each
       group), and a window partitioned by (group, bucket, p) — never
       by group alone — picks the residual rank.

    Versus the naive per-group ROW_NUMBER window (whose task count is
    |groups| and task SIZE is the whole group — half the fact table
    for a dominant group), the sort here touches ~1/n_buckets of each
    group per requested p, fully parallel. Two passes over the input
    (count + filtered rank): persist the source frame when its
    lineage is expensive. ``broadcast_needed=False`` swaps the
    needed-list broadcast for a plain shuffle join — set it when
    |groups| × |probs| is too large to broadcast (the same dial as
    ``with_ordered_prefix``'s ``broadcast_carry``).

    Returns a LONG frame: (*partition_cols, prob double, n bigint,
    value) — one row per (group, p); callers pivot as needed. Exact:
    ties in ``value`` land in one bucket, so the tiebreak ordering
    inside the bucket reproduces the global order's selection
    bit-for-bit; k = CEIL(p · n) is the same IEEE double product +
    ceil on both engines.
    """
    if not probs or any(not (0.0 < p <= 1.0) for p in probs):
        raise ValueError("probs must lie in (0, 1]")
    if len(set(float(p) for p in probs)) != len(probs):
        raise ValueError(
            "duplicate probs: each p is the needed-list join key and "
            "the residual-rank window partition, so a duplicate would "
            "double every joined row and silently shift the selected "
            "order statistic — pass each p once"
        )
    targets = [
        (
            float(p),
            (
                lambda n, p=p: F.ceil(
                    F.lit(float(p)) * n.cast("double")
                ).cast("bigint")
            ),
        )
        for p in probs
    ]
    return _bucket_locate(
        df,
        value_col,
        targets,
        list(partition_cols),
        tiebreak_cols,
        n_buckets,
        label_col="prob",
        label_is_double=True,
        boundaries=boundaries,
        broadcast_needed=broadcast_needed,
    )


class _ColInt:
    """Exact int64 arithmetic PROXY over a Spark Column — lets
    caller-supplied Python rank formulas (``n -> k`` built from
    ``+ - * //`` and int literals, e.g. ``lambda n: (n + 9) // 10``)
    evaluate UNCHANGED against the in-engine group size, so the same
    lambda that states the oracle's integer arithmetic compiles to a
    JVM-side expression instead of running on a collected count.

    Floor division is ``(a - a % b) / b`` cast to bigint: the
    remainder-subtracted dividend is exactly divisible, and IEEE
    double division of two exactly-representable operands with an
    exactly-representable integer quotient is exact — valid for the
    rank domain (|k| ≤ n ≤ 2^53, far above any group size). Spark's
    ``%`` has the dividend's sign, matching Python for the
    non-negative counts this domain guarantees."""

    __slots__ = ("col",)

    def __init__(self, col: Column):
        self.col = col

    def _lift(self, other) -> Column:
        if isinstance(other, _ColInt):
            return other.col
        if isinstance(other, int) and not isinstance(other, bool):
            return F.lit(other).cast("bigint")
        raise TypeError(
            f"rank formulas may combine the group size with int "
            f"literals via + - * // only; got {type(other).__name__}"
        )

    def __add__(self, other):
        return _ColInt(self.col + self._lift(other))

    __radd__ = __add__

    def __sub__(self, other):
        return _ColInt(self.col - self._lift(other))

    def __rsub__(self, other):
        return _ColInt(self._lift(other) - self.col)

    def __mul__(self, other):
        return _ColInt(self.col * self._lift(other))

    __rmul__ = __mul__

    def __floordiv__(self, other):
        a, b = self.col, self._lift(other)
        return _ColInt(((a - a % b) / b).cast("bigint"))


def group_rank_statistics(
    df: DataFrame,
    value_col: str,
    rank_fns: dict[str, "callable"],
    partition_cols: list[str],
    tiebreak_cols: list[str],
    n_buckets: int = 64,
    *,
    boundaries: list[float] | None = None,
    broadcast_needed: bool = True,
) -> DataFrame:
    """``group_order_statistics`` with CALLER-SUPPLIED integer rank
    functions ``label -> (n -> k)`` instead of float probabilities —
    for selections whose rank arithmetic must match an oracle's
    integer formula exactly (e.g. ``(n + 9) div 10``), where
    ``ceil(p·n)`` in floating point could differ at adversarial n.

    Each function receives the group size as an exact-int64 proxy
    (``_ColInt``) and runs IN-ENGINE; plain Python lambdas over
    ``+ - * //`` work verbatim. Functions needing richer expressions
    may instead accept a ``pyspark.sql.Column`` (bigint n) and return
    a Column k. Returns (*partition_cols, stat string, n bigint,
    value)."""
    if not rank_fns:
        raise ValueError("rank_fns must not be empty")

    def _as_col_fn(fn):
        def k_expr(n_col: Column) -> Column:
            try:
                res = fn(_ColInt(n_col))
            except TypeError:
                res = fn(n_col)
            if isinstance(res, _ColInt):
                return res.col
            if isinstance(res, Column):
                return res
            raise TypeError(
                "rank function must return the proxy/Column it was "
                f"given arithmetic over, got {type(res).__name__}"
            )

        return k_expr

    targets = [
        (label, _as_col_fn(fn)) for label, fn in rank_fns.items()
    ]
    return _bucket_locate(
        df,
        value_col,
        targets,
        list(partition_cols),
        tiebreak_cols,
        n_buckets,
        label_col="stat",
        label_is_double=False,
        boundaries=boundaries,
        broadcast_needed=broadcast_needed,
    )


def _bucket_locate(
    df: DataFrame,
    value_col: str,
    targets: list[tuple],
    pcols: list[str],
    tiebreak_cols: list[str],
    n_buckets: int,
    label_col: str,
    label_is_double: bool,
    boundaries: list[float] | None = None,
    broadcast_needed: bool = True,
) -> DataFrame:
    """Shared bucket-locate core: ``targets`` is a list of
    (label, n_col -> k_col) pairs; ranks are clamped to [1, n].

    Fully in-engine (rewritten round 11 — the driver-side locate and
    its unguarded |groups| × n_buckets collect are gone): the
    (group, bucket) count aggregate gets a running-count-before and a
    group total over ONE bounded window per group (≤ n_buckets rows
    each — the ``with_ordered_prefix`` carry shape), each target's
    rank k is derived as a column expression over the group total,
    and the bucket holding k is the row where
    ``cum_before < k ≤ cum_before + count``. The needed-list then
    joins back to the data exactly as before. No driver data
    movement ⇒ no bounded-group contract: per-id partition keys are
    as safe here as in the prefix operator.

    ``boundaries``: precomputed bucket boundaries (e.g. from
    ``quantile_boundaries``) — callers running several locate passes
    over one frame batch the boundary jobs; any sorted list works,
    balance only affects speed, never values."""
    if boundaries is None:
        boundaries = _bucket_boundaries(df, value_col, n_buckets)
    d = df.withColumn("_gos_bkt", _bucket_expr(value_col, boundaries))
    cnt = d.groupBy(*pcols, "_gos_bkt").agg(
        F.count(F.lit(1)).alias("_gos_c")
    )
    # Bounded carry windows: ≤ n_buckets rows per partition group by
    # construction (bucket ids come from _bucket_expr). Same audit
    # allowlist shape as with_ordered_prefix's carry.
    w_before = (
        Window.partitionBy(*pcols)
        .orderBy("_gos_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy(*pcols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    loc = cnt.select(
        *pcols,
        "_gos_bkt",
        "_gos_c",
        F.coalesce(
            F.sum("_gos_c").over(w_before), F.lit(0).cast("bigint")
        ).alias("_gos_cum"),
        F.sum("_gos_c").over(w_all).cast("bigint").alias("_gos_n"),
    )
    label_sql = "double" if label_is_double else "string"
    n_col = F.col("_gos_n")
    structs = [
        F.struct(
            F.lit(label).cast(label_sql).alias("_gos_lbl"),
            F.least(
                F.greatest(k_fn(n_col).cast("bigint"), F.lit(1)),
                n_col,
            ).alias("_gos_k"),
        )
        for label, k_fn in targets
    ]
    needed = (
        loc.withColumn("_gos_t", F.explode(F.array(*structs)))
        .where(
            (F.col("_gos_t._gos_k") > F.col("_gos_cum"))
            & (
                F.col("_gos_t._gos_k")
                <= F.col("_gos_cum") + F.col("_gos_c")
            )
        )
        .select(
            *pcols,
            "_gos_bkt",
            F.col("_gos_t._gos_lbl").alias("_gos_lbl"),
            (F.col("_gos_t._gos_k") - F.col("_gos_cum")).alias(
                "_gos_r"
            ),
            "_gos_n",
        )
    )
    j = _null_safe_join(
        d, needed, pcols + ["_gos_bkt"], broadcast_needed
    )
    w = Window.partitionBy(*pcols, "_gos_bkt", "_gos_lbl").orderBy(
        F.col(value_col), *[F.col(c) for c in tiebreak_cols]
    )
    return (
        j.withColumn("_gos_rn", F.row_number().over(w))
        .where(F.col("_gos_rn") == F.col("_gos_r"))
        .select(
            *pcols,
            F.col("_gos_lbl").alias(label_col),
            F.col("_gos_n").cast("bigint").alias("n"),
            F.col(value_col).alias("value"),
        )
    )


def with_ordered_lead(
    df: DataFrame,
    primary: str,
    order_cols: list[Column | str],
    lead_cols: dict[str, str],
    *,
    partition_cols: list[str] | None = None,
    n_buckets: int = 64,
    boundaries: list[float] | None = None,
    broadcast_carry: bool = True,
) -> DataFrame:
    """Exact LEAD(1) under a total order, computed distributed — the
    neighbor-access companion to ``with_ordered_prefix``: in-bucket
    windows produce every lead except each bucket's LAST row, whose
    successor lives in the next non-empty bucket; those boundary
    values come from a per-(group, bucket) FIRST-row aggregate
    (≤ n_buckets rows per group) whose own lead, over one bounded
    carry window, is broadcast back.

    ``order_cols`` must be plain ASC-sorting expressions (negate for
    descending — the ``with_ordered_prefix`` convention), because the
    boundary aggregate orders them as a STRUCT via ``min_by``.
    NULL-safety: leads are carried as (present, value) structs, so a
    legitimate NULL in a successor's ``lead_cols`` value is
    distinguished from "no successor" — the final row of the final
    non-empty bucket is the only NULL-lead row per group, exactly as
    the single-task window would produce.

    ``broadcast_carry=False`` swaps the boundary broadcast for a
    plain equi-join — required for HIGH-cardinality
    ``partition_cols`` (e.g. per (series, day)), where the carry
    table is |groups| x n_buckets rows. In that regime also pass
    group-relative ``boundaries`` (e.g. static within-day offsets):
    GLOBAL value quantiles would land every group in one bucket and
    buy nothing.
    """
    pcols = list(partition_cols or [])
    if boundaries is None:
        boundaries = _bucket_boundaries(df, primary, n_buckets)
    d = df.withColumn("_olx_bkt", _bucket_expr(primary, boundaries))
    okey = F.struct(
        *[c if isinstance(c, Column) else F.col(c) for c in order_cols]
    )
    w_in = Window.partitionBy(*pcols, "_olx_bkt").orderBy(*order_cols)

    def wrap(src: str) -> Column:
        return F.struct(
            F.lit(True).alias("p"), F.col(src).alias("v")
        )

    for out, src in lead_cols.items():
        d = d.withColumn(f"_olx_in_{out}", F.lead(wrap(src)).over(w_in))
    firsts = d.groupBy(*pcols, "_olx_bkt").agg(
        *[
            F.min_by(wrap(src), okey).alias(f"_olx_first_{out}")
            for out, src in lead_cols.items()
        ]
    )
    # ≤ n_buckets rows per group — the same bounded-carry shape as
    # with_ordered_prefix's offset window
    w_next = Window.partitionBy(*pcols).orderBy("_olx_bkt")
    carry = firsts.select(
        *pcols,
        "_olx_bkt",
        *[
            F.lead(f"_olx_first_{out}").over(w_next).alias(
                f"_olx_next_{out}"
            )
            for out in lead_cols
        ],
    )
    d = _null_safe_join(
        d, carry, pcols + ["_olx_bkt"], broadcast_carry
    )
    for out in lead_cols:
        resolved = F.coalesce(
            F.col(f"_olx_in_{out}"), F.col(f"_olx_next_{out}")
        )
        d = d.withColumn(out, resolved["v"])
    drop = (
        ["_olx_bkt"]
        + [f"_olx_in_{o}" for o in lead_cols]
        + [f"_olx_next_{o}" for o in lead_cols]
    )
    return d.drop(*drop)
