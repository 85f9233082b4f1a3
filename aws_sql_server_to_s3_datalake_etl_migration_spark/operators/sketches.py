"""Mergeable frequency sketches: batched Misra-Gries heavy hitters.

Complements the HLL distinct sketches in ``operators/rollup.py``: where
HLL answers "how many distinct", Misra-Gries answers "which items are
frequent" in one pass with bounded memory — the sketch a 100 TB token
stream needs when the exact ``groupBy(term).count()`` vocabulary no
longer fits a shuffle partition.

Algorithm (batched MG, per partition, inside one ``mapInPandas``):
keep at most ``capacity`` counters; when a merged batch overflows,
subtract the (capacity+1)-th largest count from every counter and drop
the non-positive ones, accumulating the subtraction into the
partition's error term. Guarantees, with N_p tokens in partition p and
e_p the partition error:

- every counter is a LOWER bound on the true in-partition count, low
  by at most e_p ≤ N_p / (capacity+1);
- any item with true count > e_p survives, so no item with frequency
  above N/(capacity+1) is ever lost.

Summaries merge by summing counters per term (errors add), which is
exactly the groupBy the merge stage runs — the sketch is mergeable
across partitions, batches, and incremental-rollup refreshes. When
``capacity`` exceeds the distinct-item count of every partition the
error term is zero and the sketch degenerates to the exact counts
(the regime the DuckDB oracle checks; the lossy regime is covered by
differential pytests against exact counts).

Scale posture: with ``tokenize=True`` the raw *documents* cross the
Arrow boundary (one row per doc), never the exploded token stream, and
tokenization + counting run vectorized in pandas; each partition emits
≤ capacity+1 summary rows. The whole pipeline is one scan + one
shuffle of |summaries| rows — the corpus-wide error total rides along
as a NULL-term sentinel row per partition and is recovered in the same
merge aggregation (no second scan, no driver round-trip).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SUMMARY_SCHEMA = "term string, cnt long, part_err long"


def _mg_summarize(capacity: int, tokenize: bool):
    """Per-partition batched Misra-Gries over a single string column.

    Emits one row per surviving counter (``part_err`` 0) plus exactly
    one NULL-term sentinel row carrying the partition's error term, so
    the merge stage recovers both term counts and the corpus-wide
    error bound from a single groupBy.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        err = 0
        for pdf in batches:
            if pdf.empty:
                continue
            col = pdf.iloc[:, 0].dropna()
            if tokenize:
                # whitespace-run tokenization, vectorized; equivalent
                # to trim + split('\\s+') for ASCII corpora (exotic
                # Unicode whitespace classes can differ per engine —
                # pass pre-tokenized input to pin a custom contract)
                toks = col.str.strip().str.split().explode().dropna()
            else:
                toks = col
            for term, n in toks.value_counts().items():
                counters[term] = counters.get(term, 0) + int(n)
            if len(counters) > capacity:
                # batched decrement: subtract the (capacity+1)-th
                # largest count from everyone, drop the non-positive
                cuts = sorted(counters.values(), reverse=True)
                t = cuts[capacity]
                err += t
                counters = {
                    k: v - t for k, v in counters.items() if v - t > 0
                }
        yield pd.DataFrame(
            {
                "term": [*counters, None],
                "cnt": [*counters.values(), 0],
                "part_err": [0] * len(counters) + [err],
            }
        )

    return run


def frequent_terms(
    df: DataFrame,
    term_col: str = "tok",
    capacity: int = 4096,
    k: int = 50,
    tokenize: bool = False,
) -> DataFrame:
    """Top-``k`` frequent terms via mergeable Misra-Gries summaries.

    ``df[term_col]`` holds one token per row, or — with
    ``tokenize=True`` — raw text that is whitespace-tokenized inside
    the Arrow batch (the fast path: documents, not tokens, cross the
    JVM/Python boundary).

    Returns ``(term, est_count, max_err)`` ordered by estimated count
    descending (term ascending tiebreak): ``est_count`` is a lower
    bound on the true count, ``max_err`` the corpus-wide slack (sum of
    partition errors — zero means the counts are exact). The global
    window that attaches ``max_err`` runs over the *merged summary*
    table, bounded at (capacity+1) × partitions rows — never raw data.
    """
    summaries = df.select(
        F.col(term_col).cast("string").alias("term")
    ).mapInPandas(_mg_summarize(capacity, tokenize), schema=_SUMMARY_SCHEMA)
    merged = summaries.groupBy("term").agg(
        F.sum("cnt").alias("est_count"),
        F.sum("part_err").alias("err_part"),
    )
    total_err = F.sum(
        F.when(F.col("term").isNull(), F.col("err_part")).otherwise(0)
    ).over(Window.partitionBy())
    return (
        merged.withColumn("max_err", total_err.cast("long"))
        .where(F.col("term").isNotNull())
        .orderBy(F.col("est_count").desc(), F.col("term").asc())
        .limit(k)
        .select("term", "est_count", "max_err")
    )
