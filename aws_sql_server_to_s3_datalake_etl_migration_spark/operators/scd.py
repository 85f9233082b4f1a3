"""Slowly-changing-dimension Type 2: versioned dimension maintenance.

Generalizes the reference's SCD-0 full-row MERGE
(``utils.py:222-230``: ``whenMatchedUpdateAll / whenNotMatchedInsertAll``)
to the history-keeping form a warehouse actually wants: instead of
overwriting a matched row, the old version is *closed* (validity
interval capped, current-flag dropped) and the new attribute values are
inserted as a fresh open version. Downstream as-of queries then join on
``key AND ts >= valid_from AND (valid_to IS NULL OR ts < valid_to)``.

Scale posture: one shuffle per side — the open slice of the dimension
and the update snapshot full-outer-join on the business key, un-hinted
(both sides grow with the data; AQE broadcasts when one side turns out
small). The three output classes (untouched / closed+reopened / fresh)
are filters over that single joined frame, so Spark reuses the exchange
rather than re-scanning; closed-history rows pass through without ever
entering the join.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
    batch_ts: Column,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    flag_col: str = "is_current",
) -> DataFrame:
    """Apply an update snapshot to an SCD2 history table.

    ``current``: the history table — business columns plus the three
    bookkeeping columns (``from_col``/``to_col``/``flag_col``).
    ``updates``: one row per business key with the new attribute values
    (business columns only). All non-key business columns are tracked,
    matching the reference MERGE's update-all semantics.

    Row classes in the result:
    - closed history rows: passed through untouched;
    - open rows whose key is absent from ``updates`` or whose tracked
      columns all match (null-safely): passed through untouched;
    - open rows with a differing update: emitted closed at ``batch_ts``
      plus a new open version carrying the update's values;
    - update keys absent from ``current``: inserted as open versions.
    """
    bookkeeping = {from_col, to_col, flag_col}
    business = [c for c in current.columns if c not in bookkeeping]
    tracked = [c for c in business if c not in keys]
    missing = [c for c in business if c not in updates.columns]
    if missing:
        raise ValueError(f"updates is missing business columns: {missing}")

    closed_history = current.where(~F.col(flag_col))
    open_rows = current.alias("cur").where(F.col(flag_col))
    upd = updates.select(*business).alias("upd")

    key_cond = reduce(
        lambda a, b: a & b,
        [F.col(f"cur.{k}") == F.col(f"upd.{k}") for k in keys],
    )
    joined = open_rows.join(upd, key_cond, "full_outer")

    cur_present = F.col(f"cur.{keys[0]}").isNotNull()
    upd_present = F.col(f"upd.{keys[0]}").isNotNull()
    differs = reduce(
        lambda a, b: a | b,
        [
            ~F.col(f"cur.{c}").eqNullSafe(F.col(f"upd.{c}"))
            for c in tracked
        ],
    ) if tracked else F.lit(False)

    def _cur(extra_to: Column | None = None, flag: bool = True) -> list:
        cols = [F.col(f"cur.{c}").alias(c) for c in business]
        cols.append(F.col(f"cur.{from_col}").alias(from_col))
        cols.append(
            (extra_to if extra_to is not None else F.col(f"cur.{to_col}"))
            .alias(to_col)
        )
        cols.append(F.lit(flag).alias(flag_col))
        return cols

    def _upd() -> list:
        cols = [F.col(f"upd.{c}").alias(c) for c in business]
        cols.append(batch_ts.alias(from_col))
        cols.append(F.lit(None).cast("timestamp").alias(to_col))
        cols.append(F.lit(True).alias(flag_col))
        return cols

    untouched = joined.where(
        cur_present & (~upd_present | ~differs)
    ).select(*_cur())
    closed = joined.where(cur_present & upd_present & differs).select(
        *_cur(extra_to=batch_ts, flag=False)
    )
    reopened = joined.where(cur_present & upd_present & differs).select(
        *_upd()
    )
    fresh = joined.where(~cur_present).select(*_upd())

    return (
        closed_history.select(*business, from_col, to_col, flag_col)
        .unionByName(untouched)
        .unionByName(closed)
        .unionByName(reopened)
        .unionByName(fresh)
    )


def scd2_bootstrap(
    snapshot: DataFrame,
    initial_ts: Column,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    flag_col: str = "is_current",
) -> DataFrame:
    """Promote a plain dimension snapshot to SCD2 shape: every row open
    from ``initial_ts`` (the M3 first-load bootstrap of ``utils.py:
    238-240``, lifted to the versioned schema)."""
    return (
        snapshot.withColumn(from_col, initial_ts)
        .withColumn(to_col, F.lit(None).cast("timestamp"))
        .withColumn(flag_col, F.lit(True))
    )


def scd2_change_feed(
    history: DataFrame,
    keys: list[str],
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    flag_col: str = "is_current",
) -> DataFrame:
    """Derive the CDC event stream a history table encodes — the
    inverse of ``scd2_apply`` (downstream consumers often want "what
    changed, when" as a feed, while the warehouse stores state as
    SCD2): per key ordered by ``from_col``, the first version is an
    ``insert`` at its ``valid_from``, every later version an
    ``update`` at its ``valid_from``, and a closed final version (no
    successor, not current) a trailing ``delete`` at its ``valid_to``.

    One window partitioned by the business key (version-count-sized
    partitions), no joins; deterministic because SCD2 versions are
    totally ordered by ``from_col`` within a key. Returns the business
    columns + (``change_ts``, ``op``); feed order is (key, change_ts).
    """
    from pyspark.sql.window import Window

    business = [
        c for c in history.columns
        if c not in {from_col, to_col, flag_col}
    ]
    w = Window.partitionBy(*keys).orderBy(from_col)
    versioned = history.select(
        *business,
        F.col(from_col),
        F.col(to_col),
        F.col(flag_col),
        F.row_number().over(w).alias("_vn"),
        F.lead(from_col).over(w).alias("_next_from"),
    )
    changes = versioned.select(
        *business,
        F.col(from_col).alias("change_ts"),
        F.when(F.col("_vn") == 1, F.lit("insert"))
        .otherwise(F.lit("update"))
        .alias("op"),
    )
    deletes = versioned.where(
        F.col("_next_from").isNull()
        & ~F.col(flag_col)
        & F.col(to_col).isNotNull()
    ).select(
        *business,
        F.col(to_col).alias("change_ts"),
        F.lit("delete").alias("op"),
    )
    return changes.unionByName(deletes)
