"""Record linkage: exact edit-distance self-join via deletion
neighborhoods.

The reference's recon layer (recon_utils.py) compares entities only on
exact keys; a training-data curation pipeline also needs *fuzzy* entity
resolution — "which records are the same thing up to a typo" — without
an O(n^2) cross join. This module provides an EXACT small-distance
Levenshtein self-join built from the public deletion-neighborhood
blocking idea (Bocek et al. "Fast Similarity Search in Large
Dictionaries", 2007; popularized by the SymSpell spelling corrector):

    lev(s, t) <= d  =>  D_{<=d}(s) ∩ D_{<=d}(t) != ∅

where ``D_{<=d}(s)`` is the set of strings obtainable from ``s`` by
deleting at most ``d`` characters. (Each substitution in an optimal
alignment deletes one character from each side; each insertion/deletion
deletes one character from one side — so both sides reach a common
reduced string with at most ``d`` deletions each.) The converse can
produce false positives, so every candidate pair is verified with the
built-in ``levenshtein`` (threshold form — early-exits JVM-side).

Scale posture (the whole point vs. a cross join):

- Key generation is pure whole-stage codegen: nested ``transform`` over
  a ``sequence`` builds the deletion variants; no Python touches rows.
- Fan-out is bounded: a length-L string emits at most
  ``1 + L + L*(L-1)/2`` keys for d=2 (19 keys for L=18, d=1) — a
  constant-factor explode, not a quadratic pairing.
- Candidates come from ONE shuffle: an equi-join on the deletion key.
  Bucket sizes track true near-duplicate density, so work is
  O(matches), not O(n^2). Verification is a codegen ``levenshtein``
  per candidate with threshold early-exit.
- Exact-duplicate groups would make the full-string key quadratic in
  the group size; callers with duplicated strings should dedup to
  distinct strings first (``exact_dedup``) and expand afterwards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _one_char_deletions(col: str) -> str:
    """SQL expr: array of all strings formed by deleting one char."""
    return (
        f"transform(sequence(1, length({col})), "
        f"i -> concat(substring({col}, 1, i - 1), "
        f"substring({col}, i + 1, length({col}))))"
    )


def deletion_keys(col: str, max_distance: int) -> F.Column:
    """Blocking-key array: the string plus every distinct variant with
    up to ``max_distance`` characters deleted (codegen only)."""
    if max_distance not in (1, 2):
        raise ValueError("max_distance must be 1 or 2")
    level1 = _one_char_deletions(col)
    if max_distance == 1:
        expr = f"array_distinct(concat(array({col}), {level1}))"
    else:
        # depth-2: delete one more char from every depth-1 variant
        level2 = (
            f"flatten(transform({level1}, v -> "
            "transform(sequence(1, length(v)), "
            "i -> concat(substring(v, 1, i - 1), "
            "substring(v, i + 1, length(v))))))"
        )
        expr = (
            f"array_distinct(concat(array({col}), {level1}, {level2}))"
        )
    return F.expr(expr)


def edit_distance_self_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_distance: int = 1,
    hot_key_cap: int | None = None,
    block_cols: list[str] | None = None,
) -> DataFrame:
    """All pairs of rows whose ``str_col`` values are within Levenshtein
    distance ``max_distance`` (EXACT — guaranteed recall via the
    deletion-neighborhood containment above, precision via a verify
    pass). Returns (left_id, right_id, dist) with left_id < right_id.

    Assumes ``str_col`` is unique per row (dedup identical strings
    first; identical-string groups belong to ``exact_dedup``).

    ``block_cols``: equality hard-blocks (e.g. "same nation") folded
    INTO the blocking key — the join key becomes
    ``xxhash64(variant, *block_cols)``, so cross-block candidates are
    never generated, shuffled, or Levenshtein-verified. Semantically
    identical to post-filtering the pair set on block-column equality
    (the pair output carries no block columns either way), but the
    candidate volume drops where blocking belongs: before the shuffle.
    Rows with a NULL block column never pair (xxhash64 folds NULL to
    a seed-stable value, but we filter them out to keep "equality"
    semantics strict — NULL != NULL).

    ``hot_key_cap``: adversarial data (e.g. a constant shared prefix
    the deletion falls outside of) can make one deletion key cover a
    large fraction of rows, turning its bucket quadratic — the same
    failure mode as a hot LSH band bucket. With a cap, keys whose row
    frequency exceeds it are dropped BEFORE pairing (one aggregated
    semi-join on the key, same defusal as ``minhash_lsh_pairs``'s
    bucket cap). This trades exactness for boundedness: a true pair
    survives iff at least one of its shared deletion keys is cold, so
    the capped result is a SUBSET of the exact one — prefer leaving it
    off unless key-frequency skew is demonstrated. With ``block_cols``
    the cap applies to the composite (variant, block) key, so a key
    hot in one block does not suppress pairs in another.
    """
    # Join on the 64-bit hash of each deletion variant (composed with
    # the block columns when given), not the variant string: the
    # shuffle key drops from O(len) chars to 8 bytes, and a hash
    # collision can only ADD a candidate pair, which the levenshtein
    # verify below removes — exactness is unaffected. (A collision
    # ACROSS blocks could in principle admit a cross-block pair that
    # the verify pass keeps; with 64-bit keys that is a ~2^-64 event
    # per candidate, and the deterministic seed makes any such pair
    # reproducible — acceptable for the blocking use case, identical
    # in kind to the LSH band-hash contract elsewhere in this repo.)
    block_exprs = [F.col(c) for c in (block_cols or [])]
    src = df
    if block_cols:
        for c in block_cols:
            src = src.where(F.col(c).isNotNull())
    # Persisted: both join sides below read this frame, and
    # unpersisted each side re-ran the scan + deletion-variant
    # explode (the variant expression — length+1 substrings per row —
    # dominates the pre-join cost; plan audit showed it twice, with
    # no ReusedExchange because the sides' projections differ).
    # Released after the verified pair set materializes (r14
    # optimization, guide §5).
    keyed = keyed_base = src.select(
        F.col(id_col).alias("_id"),
        F.col(str_col).alias("_s"),
        F.explode(
            F.transform(
                deletion_keys(str_col, max_distance),
                lambda v: F.xxhash64(v, *block_exprs),
            )
        ).alias("_key"),
    ).persist()
    if hot_key_cap is not None:
        cold = (
            keyed.groupBy("_key")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") <= hot_key_cap)
            .select("_key")
        )
        keyed = keyed.join(cold, "_key", "left_semi")
    left = keyed.select(
        F.col("_key"),
        F.col("_id").alias("left_id"),
        F.col("_s").alias("_ls"),
    )
    right = keyed.select(
        F.col("_key"),
        F.col("_id").alias("right_id"),
        F.col("_s").alias("_rs"),
    )
    try:
        pairs = (
            left.join(right, "_key")
            .where(F.col("left_id") < F.col("right_id"))
            # verify BEFORE dedup: the threshold-form levenshtein is
            # cheap codegen, so the dedup shuffle then carries only
            # true pairs (a pair can share several deletion keys)
            .withColumn(
                "dist", F.levenshtein("_ls", "_rs", max_distance)
            )
            .where(F.col("dist") >= 0)  # threshold form: -1 = exceeded
            .select("left_id", "right_id", F.col("dist").cast("bigint"))
            .dropDuplicates(["left_id", "right_id"])
            .persist()
        )
        pairs.count()
        return pairs
    finally:
        keyed_base.unpersist()
