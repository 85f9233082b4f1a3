"""Pareto frontier (skyline) over two maximize-dimensions.

The reference has no skyline operator (its SQL surface stops at
joins + aggregates, ``table_jobs/*``); a lake-scale catalog needs one
for "best trade-off" queries — newest AND highest-value orders,
cheapest AND fastest suppliers. The classic distributed recipe is
two-phase: a sound grid PRE-FILTER that discards points provably
dominated by a point in a strictly-higher bucket, then an EXACT pass
over the (tiny) surviving band. Both phases are plain DataFrame ops —
one aggregate, one broadcast join, one window over survivors — so
Catalyst/AQE handle the physical strategy.

Dominance (maximize both): q dominates p iff q.x >= p.x and
q.y >= p.y with at least one strict. Exact ties on BOTH dims are
mutually non-dominating — every tied row survives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_buckets: int = 256,
) -> DataFrame:
    """Rows of ``df`` on the maximize-(x, y) Pareto frontier.

    Phase 1 (pre-filter, bounds the exact pass's input): bucket x into
    ``n_buckets`` equal-width ranges (one min/max aggregate); per
    bucket, the max y (tiny aggregate, broadcast back). Every point in
    a strictly higher bucket has strictly larger x than every point in
    a lower one (half-open ranges), so a point whose y <= the running
    max-y over higher buckets is dominated and dropped WITHOUT a
    global sort. Sound: only provably-dominated points are removed.

    Phase 2 (exact, over survivors only): per distinct x the max y —
    a same-x point below it is dominated (y strict); then a running
    max of that over strictly-larger x (window over the now-small
    distinct-x set) — a point not strictly above it is dominated
    (x strict). At 100 TB the window sees the frontier band, not the
    table: the global sort this operator can't avoid runs on ~frontier
    cardinality rows.
    """
    pts = df.withColumn("_x", F.col(x_col)).withColumn("_y", F.col(y_col))
    lo, hi = pts.agg(
        F.min("_x").alias("lo"), F.max("_x").alias("hi")
    ).first()
    if lo is None:
        return df.limit(0)
    width = (hi - lo) / n_buckets if hi > lo else None
    if width is None:
        bucket = F.lit(0)
    else:
        bucket = F.least(
            F.lit(n_buckets - 1),
            F.floor((F.col("_x") - F.lit(lo)) / F.lit(width)),
        ).cast("int")
    pts = pts.withColumn("_b", bucket)
    # running max-y over strictly higher buckets, computed on the
    # n_buckets-row summary (driver-side: it is bounded by n_buckets,
    # independent of data scale)
    bmax = {
        r["_b"]: r["my"]
        for r in pts.groupBy("_b").agg(F.max("_y").alias("my")).collect()
    }
    higher: dict[int, object] = {}
    run = None
    for b in range(n_buckets - 1, -1, -1):
        higher[b] = run
        if b in bmax and (run is None or bmax[b] > run):
            run = bmax[b]
    hmap = F.create_map(
        *[
            c
            for b, m in higher.items()
            if m is not None
            for c in (F.lit(b), F.lit(m))
        ]
    ) if any(m is not None for m in higher.values()) else None
    if hmap is not None:
        pts = pts.where(
            F.element_at(hmap, F.col("_b")).isNull()
            | (F.col("_y") > F.element_at(hmap, F.col("_b")))
        )
    # exact pass on the surviving band
    gmax = pts.groupBy("_x").agg(F.max("_y").alias("_gy"))
    w = Window.orderBy(F.col("_x").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    gmax = gmax.withColumn("_rm", F.max("_gy").over(w))
    return (
        pts.join(gmax, on="_x")
        .where(
            (F.col("_y") == F.col("_gy"))
            & (F.col("_rm").isNull() | (F.col("_y") > F.col("_rm")))
        )
        .drop("_x", "_y", "_b", "_gy", "_rm")
    )
