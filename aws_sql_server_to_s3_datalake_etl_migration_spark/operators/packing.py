"""Exact greedy sequence packing for training-context assembly.

``doc_pack_offsets`` (workloads_llm.py) lays out a *chunked
approximation* of packing because exact first-fit is inherently
sequential. This module provides the exact variant where it is still
scalable: greedy next-fit *within* a content-hashed shard, shards
packed in parallel. Each (group, shard) stream is folded sequentially
inside one ``applyInPandas`` call — exact bin boundaries, documents
never split across sequences — while a 100 TB corpus still packs in
|groups| × |shards| parallel streams whose sizes the shard count
controls.

Packing waste is bounded: next-fit leaves < capacity slack per closed
sequence, so utilization ≥ 50% worst-case and ≈ 1 − mean(doc)/2·cap
for typical corpora; raise the shard count to bound per-task memory,
not to improve packing (shards don't share sequences).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_col: str,
    capacity: int,
    group_cols: Sequence[str] = ("source", "shard"),
) -> DataFrame:
    """Assign each row a ``seq_id`` / ``seq_offset`` inside its
    group's greedy next-fit packing (rows taken in ``order_col``
    order; a row longer than ``capacity`` closes its own sequence and
    is flagged ``overflow``). ``seq_id`` is unique within the group —
    the global sequence key is (group_cols…, seq_id).
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    keys = list(group_cols)
    cols = [*keys, order_col, token_col]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*cols).schema.fields
    ) + ", seq_id long, seq_offset long, overflow boolean"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(
            drop=True
        )
        seq_ids, offsets, flags = [], [], []
        seq, used = 0, 0
        for n in pdf[token_col].astype("int64"):
            n = int(n)
            if used > 0 and used + n > capacity:
                seq, used = seq + 1, 0
            seq_ids.append(seq)
            offsets.append(used)
            flags.append(n > capacity)
            used += n
            if used >= capacity:
                seq, used = seq + 1, 0
        pdf["seq_id"] = pd.Series(seq_ids, dtype="int64")
        pdf["seq_offset"] = pd.Series(offsets, dtype="int64")
        pdf["overflow"] = flags
        return pdf

    return (
        df.select(*cols)
        .groupBy(*keys)
        .applyInPandas(pack, schema=out_schema)
    )


def packing_stats(
    packed: DataFrame,
    token_col: str,
    capacity: int,
    group_cols: Sequence[str] = ("source", "shard"),
) -> DataFrame:
    """Utilization report per group: sequences used, mean fill
    fraction, overflow count — the sanity numbers to watch when tuning
    capacity/shards."""
    per_seq = packed.groupBy(*group_cols, "seq_id").agg(
        F.sum(token_col).alias("_fill"),
        F.max(F.col("overflow").cast("int")).alias("_over"),
    )
    return per_seq.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_sequences"),
        (F.avg(F.least(F.col("_fill"), F.lit(capacity))) / capacity).alias(
            "mean_fill"
        ),
        F.sum("_over").cast("long").alias("n_overflow"),
    )
