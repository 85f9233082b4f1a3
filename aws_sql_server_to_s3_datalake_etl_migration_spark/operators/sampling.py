"""Deterministic corpus sampling.

``df.sample()`` draws from a seeded RNG *per partition*, so results
change with partitioning/cluster size — useless for reproducible corpus
construction or cross-run diffs. Hash-threshold sampling decides
per-ROW from a content hash: the same row is kept or dropped no matter
how the data is partitioned, how many executors run, or which engine
evaluates it (md5 is engine-portable, so a DuckDB/Trino twin selects
the identical row set). This is the standard trick for train/eval
splits and per-source downsampling in training-data pipelines.

Scale shape: a single codegen'd filter on the scan — no shuffle, no
RNG state, embarrassingly parallel.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 8 hex chars = 32 bits of the md5: plenty of resolution for rates
# down to ~2e-10, and a short lexicographic compare.
_HEX_DIGITS = 8
_SPACE = 16**_HEX_DIGITS


def rate_threshold(rate: float) -> str:
    """Hex threshold t such that P[substr(md5(key),1,8) < t] == rate
    for a uniform hash. rate >= 1 returns 'g', which every hex string
    sorts below (hex digits are 0-9a-f)."""
    if rate >= 1.0:
        return "g"
    return format(max(int(rate * _SPACE), 0), f"0{_HEX_DIGITS}x")


def hash_bucket(key: Column | str) -> Column:
    """The 8-hex-char md5 prefix used for thresholding (lowercase in
    every engine that implements md5)."""
    c = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(c.cast("string")), 1, _HEX_DIGITS)


def deterministic_sample(
    df: DataFrame, rate: float, key_col: str
) -> DataFrame:
    """Keep ~``rate`` of rows, decided per row by hash of ``key_col``."""
    return df.where(hash_bucket(key_col) < F.lit(rate_threshold(rate)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum ``s`` keeps
    ~``rates[s]`` of its rows (``default_rate`` otherwise). The usual
    corpus-mixing move — e.g. downweight a crawl source to 10% while
    keeping curated sources whole — expressed as one filter.
    """
    threshold = reduce(
        lambda acc, kv: F.when(
            F.col(strata_col) == kv[0], F.lit(rate_threshold(kv[1]))
        ).otherwise(acc),
        sorted(rates.items()),
        F.lit(rate_threshold(default_rate)),
    )
    return df.where(hash_bucket(key_col) < threshold)


def content_split(
    key: Column | str,
    train_pct: int = 90,
    val_pct: int = 5,
    out_names: tuple[str, str, str] = ("train", "val", "test"),
) -> Column:
    """Deterministic train/val/test assignment from a CONTENT hash:
    md5-bucket the key into 100 buckets and carve them
    train/val/test. Content-keyed (not row-id-keyed) so a document
    keeps its split across re-ingestions, and exact duplicates land in
    the same split — train never leaks a copy of a test doc."""
    c = F.col(key) if isinstance(key, str) else key
    # Same string normalization as hash_bucket: md5 over a raw non-string
    # column would hash an engine-specific binary representation (or fail
    # analysis), breaking the "same split on any engine" guarantee.
    bucket = (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    )
    return (
        F.when(bucket < train_pct, out_names[0])
        .when(bucket < train_pct + val_pct, out_names[1])
        .otherwise(out_names[2])
    )


def shuffle_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int = 256,
) -> DataFrame:
    """Deterministic global shuffle for training order, materialized
    the way a 100 TB corpus actually ships: a content-hashed shard
    assignment plus a within-shard position. Consuming shards in
    order of (shard, shard_pos) IS the shuffled order — equivalent to
    ``ORDER BY md5(key), key`` — but no single-partition global
    window is involved: the rank partitions by shard
    (parallelism = ``n_shards``), so the op scales as an ordinary
    shuffle instead of funneling the corpus through one task.

    md5 (not xxhash64) so the order is engine-portable and stable
    across re-runs; ties on the full hash break by the key itself.
    Adds ``shard`` and ``shard_pos`` columns.
    """
    from pyspark.sql.window import Window

    h = F.md5(
        (F.col(key_col) if not isinstance(key_col, str)
         else F.col(key_col)).cast("string")
    )
    out = df.withColumn("_h", h).withColumn(
        "shard",
        (
            F.conv(F.substring("_h", 1, 8), 16, 10).cast("long")
            % n_shards
        ),
    )
    w = Window.partitionBy("shard").orderBy(
        F.col("_h"), F.col(key_col)
    )
    return (
        out.withColumn("shard_pos", F.row_number().over(w).cast("long"))
        .drop("_h")
    )


def temperature_mix(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    alpha: float = 0.5,
    target_fraction: float = 0.5,
) -> DataFrame:
    """Temperature-based corpus rebalancing: sample stratum ``s`` at a
    rate ∝ share_s^(alpha-1), so rare sources/languages are upweighted
    (alpha < 1 flattens the mix; alpha = 1 keeps natural proportions —
    the multilingual-mixing knob). ``target_fraction`` sets the overall
    corpus share kept when no per-stratum rate caps at 1 (capped
    strata undershoot instead of redistributing — deterministic, no
    fixed-point iteration).

    Adds a ``mix_rate`` column and keeps a row iff its ``key_col``
    hash clears the stratum's rate (same IEEE multiply/compare as
    ``weighted_sample`` — engine-identical selection).

    Determinism across engines: alpha is restricted to {0.5, 1.0}
    because ``sqrt`` is IEEE-correctly-rounded while ``pow`` is not —
    a last-ulp pow difference could flip a hash-threshold comparison.
    The normalizer sums stratum weights through DECIMAL(18,12), so it
    is accumulation-order-free.

    Scale shape: one groupBy to |strata| rows, single-partition window
    math over that tiny table (bounded by stratum cardinality), then a
    broadcast join back + codegen'd filter — the corpus itself is
    scanned twice (counts + filter) and never shuffled.
    """
    from pyspark.sql.window import Window

    if alpha not in (0.5, 1.0):
        raise ValueError(
            "alpha must be 0.5 or 1.0: non-sqrt exponents go through "
            "pow(), which is not correctly rounded and can flip "
            "hash-threshold selections across engines"
        )
    w_all = Window.partitionBy()
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    c = counts.withColumn("_tot", F.sum("_n").over(w_all))
    share = F.col("_n").cast("double") / F.col("_tot")
    c = c.withColumn("_w", F.sqrt(share) if alpha == 0.5 else share)
    c = c.withColumn(
        "_z",
        F.sum(F.col("_w").cast("decimal(18,12)")).over(w_all)
        .cast("double"),
    )
    rates = c.withColumn(
        "mix_rate",
        F.least(
            F.lit(1.0),
            F.lit(float(target_fraction)) * F.col("_tot") * F.col("_w")
            / (F.col("_n").cast("double") * F.col("_z")),
        ),
    ).select(strata_col, "mix_rate")
    u = (
        F.conv(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
        )
        .cast("long")
        .cast("double")
    )
    return df.join(F.broadcast(rates), strata_col).where(
        u < F.col("mix_rate") * F.lit(4294967296.0)
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    scale: float,
    key_col: str,
) -> DataFrame:
    """Deterministic Poisson sampling with per-row inclusion
    probability ``min(1, scale * weight)`` — the corpus-mixing move
    when the mix knob is a per-document score (quality, freshness)
    rather than a per-stratum rate.

    Decided per row from the md5 of ``key_col`` exactly like
    ``deterministic_sample``: include iff
    ``uniform_u32 < scale * weight * 2^32``. The comparison uses only
    IEEE-exact operations (double multiply + compare — deliberately no
    log/exp, whose last-ulp behavior differs across libm
    implementations), so the selected set is bit-identical on any
    engine and invariant to partitioning. Zero shuffles: one codegen'd
    filter.
    """
    u = (
        F.conv(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
        )
        .cast("long")
        .cast("double")
    )
    thresh = (
        F.lit(float(scale))
        * F.col(weight_col).cast("double")
        * F.lit(4294967296.0)
    )
    return df.where(u < thresh)


def cap_per_stratum(
    df: DataFrame,
    strata_col: str,
    cap: int,
    rank_by: list[Column],
    rank_out: str = "stratum_rank",
) -> DataFrame:
    """Keep at most ``cap`` rows per stratum, chosen by the
    deterministic ``rank_by`` ordering — the crawl-curation primitive
    that stops one domain/source from dominating a training mix
    ("no more than N docs per domain, best-first"). Complements the
    RATE-based samplers above: a rate keeps a proportion (stratum
    share still grows with its size); a cap is an absolute ceiling.

    ``rank_by`` must be a total order (end it with a unique id
    tiebreak) or survivors become partition-order-dependent.

    Scale shape: one shuffle on the stratum key; Spark's
    WindowGroupLimit pushes the limit MAP-SIDE, so each input
    partition forwards at most ``cap`` rows per stratum before the
    shuffle — a hot domain costs O(cap x partitions) shuffled rows,
    not its full size. Caps of ~10^6+ per stratum start to look like
    top-N-heap pressure per task; at that point use a rate sampler
    and accept proportionality.
    """
    from pyspark.sql.window import Window

    if cap <= 0:
        raise ValueError("cap must be positive")
    w = Window.partitionBy(strata_col).orderBy(*rank_by)
    return (
        df.withColumn(rank_out, F.row_number().over(w))
        .where(F.col(rank_out) <= cap)
    )


def deterministic_take_n(
    df: DataFrame, n: int, key_col: str
) -> DataFrame:
    """Exactly ``n`` rows (fewer only if the input is smaller), chosen
    pseudo-randomly but DETERMINISTICALLY: order by (md5(key), key)
    and take the first n. The fixed-size companion to the rate
    samplers — "give me exactly 10k eval docs, the same ones every
    run, on any engine, at any partitioning" — where a rate can only
    promise a proportion and ``df.limit(n)`` picks
    partition-order-dependent rows.

    Scale shape: Spark plans ORDER BY + LIMIT as
    TakeOrderedAndProject — each partition keeps a local top-n heap
    and the driver merges partition winners — so no global sort and
    no full shuffle ever happens; cost is one scan + O(n) driver
    merge. Keep n in the ~10^6 ballpark or below (driver holds the
    merged result); beyond that, a rate sampler is the right tool.
    """
    if n <= 0:
        raise ValueError("n must be positive")
    c = F.col(key_col)
    return (
        df.orderBy(F.md5(c.cast("string")).asc(), c.asc())
        .limit(n)
    )


def epoch_upsample(
    df: DataFrame,
    rate_col: str,
    key_col: str,
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Materialize per-row repeat factors — the "epochs" step of an
    LLM data-mixing recipe, where an up-weighted source is physically
    repeated in the training corpus (rate 3.2 => 3 copies plus a 4th
    for ~20% of rows) and a down-weighted one is subsampled
    (rate 0.25 => 1 copy for ~25% of rows, 0 otherwise).

    Each row is emitted ``floor(rate)`` times, plus one extra copy iff
    its ``key_col`` hash clears the fractional remainder — the same
    IEEE multiply/compare primitive as ``weighted_sample``, so the
    materialized multiset is bit-identical on any engine and invariant
    to partitioning. E[copies] == rate exactly. Rows land with a
    ``copy_col`` index (0-based) so downstream shuffling/sharding can
    spread copies apart (``shuffle_shards`` keys on (id, copy_idx)).

    Scale shape: zero shuffles — one codegen'd explode whose fan-out
    is the rate itself; output volume is exactly the mixed corpus
    size. Negative rates clamp to 0.
    """
    r = F.greatest(F.col(rate_col).cast("double"), F.lit(0.0))
    u = (
        F.conv(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
        )
        .cast("long")
        .cast("double")
    )
    frac = r - F.floor(r)
    n = F.floor(r).cast("bigint") + (
        u < frac * F.lit(4294967296.0)
    ).cast("bigint")
    copies = F.when(
        n == 0, F.array().cast("array<bigint>")
    ).otherwise(F.sequence(F.lit(0).cast("bigint"), n - F.lit(1)))
    return df.withColumn(copy_col, F.explode(copies))


def token_budget_mix(
    df: DataFrame,
    heavy_sources: list[str],
    heavy_weight: int,
    default_weight: int,
    budget_num: int,
    budget_den: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Allocate a corpus-wide token budget across sources by integer
    weights, then materialize the mixture by deterministic hash-rate
    sampling — the data-mix construction step of an LLM pipeline
    ("budget B tokens total, favor these sources N:1").

    Budget B = floor(total_tokens * budget_num / budget_den).
    Allocation is proportional-with-capping in ONE redistribution
    pass: a source first gets floor(B*w/SW) tokens, capped at what it
    has; the leftover is re-split over the uncapped sources by weight
    and capped once more. A residual from double-capping stays
    unallocated by design — the pass count is part of the contract
    (an oracle can spell out one pass; a fixpoint loop it could not).

    Every step is INTEGER arithmetic over per-source aggregates
    (floor divisions, no floats), and the materialization threshold
    avoids division entirely: keep doc iff
    ``hash_u32 * T_s < alloc_s * 2^32`` compared in DECIMAL(38,0), so
    Spark and any SQL oracle agree bit-for-bit at any corpus size.
    The sampled token count approximates alloc_s in expectation —
    hash sampling is by rate, not by exact quota (deterministic_take_n
    is the exact-quota alternative when order matters more than
    independence).

    Scale shape: one hash-agg over the corpus (per-source totals,
    S rows), control-plane arithmetic on the S-row table, one
    broadcast join back, one codegen filter. The corpus is scanned
    twice (totals + materialize) and shuffled never.
    """
    if budget_num < 0 or budget_den <= 0:
        raise ValueError("budget must be a non-negative rational")
    w = (
        F.when(F.col(source_col).isin(*heavy_sources), heavy_weight)
        .otherwise(default_weight)
        .cast("bigint")
        if heavy_sources
        else F.lit(default_weight).cast("bigint")
    )
    per_src = (
        df.groupBy(source_col)
        .agg(F.sum(F.col(token_col).cast("bigint")).alias("t_s"))
        .withColumn("w_s", w)
    )
    tot = per_src.agg(
        F.sum("t_s").alias("_t"), F.sum("w_s").alias("_sw")
    ).select(
        # integer DIV, not a double cast: _t * num must stay exact
        # past 2^53 tokens
        F.expr(f"_t * {int(budget_num)} DIV {int(budget_den)}").alias("_b"),
        "_sw",
    )
    a0 = per_src.crossJoin(F.broadcast(tot)).select(
        source_col,
        "t_s",
        "w_s",
        F.expr("_b * w_s DIV _sw").alias("a0"),
    )
    a0 = a0.withColumn("c_s", F.least("t_s", "a0"))
    lv = a0.crossJoin(
        F.broadcast(
            a0.agg(
                F.sum("c_s").alias("_sc"),
                F.sum(F.when(F.col("a0") < F.col("t_s"), F.col("w_s"))).alias(
                    "_swu"
                ),
            ).crossJoin(tot.select("_b"))
        )
    )
    alloc = lv.select(
        source_col,
        "t_s",
        F.least(
            F.col("t_s"),
            F.col("c_s")
            + F.when(
                (F.col("a0") < F.col("t_s")) & F.col("_swu").isNotNull(),
                F.expr("(_b - _sc) * w_s DIV _swu"),
            ).otherwise(F.lit(0)),
        ).alias("source_budget"),
    )
    hash_u32 = F.conv(hash_bucket(id_col), 16, 10).cast("decimal(38,0)")
    keep = hash_u32 * F.col("t_s").cast("decimal(38,0)") < F.col(
        "source_budget"
    ).cast("decimal(38,0)") * F.lit(4294967296).cast("decimal(38,0)")
    return (
        df.join(F.broadcast(alloc), source_col)
        .where(keep)
        .select(source_col, id_col, token_col, "source_budget")
    )
