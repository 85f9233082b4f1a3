"""Text-analysis operators for large-scale training-data pipelines.

All pure column expressions (JVM-side, whole-stage codegen) — no Python
UDFs anywhere, so these run at full scan speed on 100 TB of documents:

- ``with_tokens``            whitespace tokenization
- ``with_token_count``       token counting (whitespace + BPE-ish regex)
- ``with_lang_id``           n-gram/stopword-ratio language heuristic
- ``with_quality_score``     length/punctuation/stopword quality signals
- ``with_fingerprint``       document fingerprint (normalized-prefix MD5
                             + a 64-bit polynomial rolling hash)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..session import with_coalesced_cached_rounds

# Tiny per-language stopword lists: enough signal for a heuristic
# language ID over whitespace tokens, cheap enough to inline in codegen.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "los", "por"],
    "de": ["der", "die", "das", "und", "zu", "ein", "mit", "von", "auf", "ist"],
    "fr": ["le", "la", "de", "et", "un", "une", "les", "des", "en", "est"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "人", "这"],
}

# BPE-ish unit: word pieces of up to 4 chars — approximates subword
# token counts without a vocab file.
BPE_PIECE_LEN = 4


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of non-empty text; empty text -> empty array."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("tokens", tokens(text_col))


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count plus a BPE-ish subword estimate
    (ceil(len/4) per word — the fixed-width-piece approximation)."""
    toks = tokens(text_col)
    bpe = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, w: acc + F.ceil(F.length(w) / BPE_PIECE_LEN).cast("bigint"),
    )
    return df.withColumn("n_tokens", F.size(toks).cast("bigint")).withColumn(
        "n_bpe_tokens", bpe
    )


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    """Fraction of whitespace tokens that are stopwords of ``lang``."""
    toks = tokens(col)
    words = STOPWORDS[lang]
    hits = F.size(F.filter(F.transform(toks, F.lower), lambda w: w.isin(*words)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(toks).cast("double")
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: highest stopword-hit ratio wins; ties
    break lexicographically (deterministic); 'und' when no hits."""
    scores = [
        F.struct(
            stopword_ratio(text_col, lang).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang in sorted(STOPWORDS)
    ]
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        "lang_pred",
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")),
    ).withColumn("lang_score", best["score"])


PUNCT_CHARS = ".,!?;:'\"()-"


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality signals: char length, token count, mean word length,
    punctuation ratio, stopword ratio, and a composite [0,1] score
    (the usual pre-training heuristics: enough-but-not-degenerate
    length, sane punctuation density, natural-language stopword mass).
    """
    c = F.col(text_col)
    toks = tokens(text_col)
    n_chars = F.length(c).cast("double")
    n_toks = F.size(toks).cast("double")
    punct = (
        n_chars
        - F.length(F.translate(c, PUNCT_CHARS, "")).cast("double")
    )
    punct_ratio = F.when(n_chars == 0, 0.0).otherwise(punct / n_chars)
    sw_ratio = stopword_ratio(text_col, "en")
    mean_wlen = F.when(n_toks == 0, 0.0).otherwise(
        F.aggregate(
            toks, F.lit(0).cast("double"), lambda a, w: a + F.length(w)
        )
        / n_toks
    )
    len_score = F.least(n_toks / 100.0, F.lit(1.0))
    punct_score = F.when(punct_ratio <= 0.2, 1.0).otherwise(
        F.greatest(F.lit(0.0), 1.0 - (punct_ratio - 0.2) * 5.0)
    )
    sw_score = F.least(sw_ratio * 5.0, F.lit(1.0))
    return (
        df.withColumn("n_tokens", n_toks.cast("bigint"))
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("stopword_ratio", sw_ratio)
        .withColumn("mean_word_len", mean_wlen)
        .withColumn(
            "quality_score",
            (0.4 * len_score + 0.3 * punct_score + 0.3 * sw_score),
        )
    )


# Polynomial rolling hash constants (classic scheme: h = (h*B + c) mod M
# with prime modulus; modular form keeps the fold inside long range
# under Spark's default ANSI overflow checking).
_POLY_BASE = 31
_POLY_MOD = 1_000_000_007


def rolling_hash(col: Column | str, prefix_len: int = 256) -> Column:
    """Order-sensitive polynomial rolling hash of the first
    ``prefix_len`` normalized characters, computed as a fold over the
    character array — pure codegen, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.substring(
        F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "), 1, prefix_len
    )
    chars = F.split(norm, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: F.pmod(
            acc * _POLY_BASE
            + F.coalesce(F.ascii(ch).cast("long"), F.lit(0)),
            F.lit(_POLY_MOD),
        ),
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Two fingerprints per document: an MD5 of the normalized 256-char
    prefix (exact-prefix dedup key, portable across engines) and the
    64-bit rolling hash (cheap locality-free fingerprint)."""
    c = F.col(text_col)
    norm = F.substring(
        F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "), 1, 256
    )
    return df.withColumn("fp_md5", F.md5(norm)).withColumn(
        "fp_roll", rolling_hash(text_col)
    )


def _bigrams(toks: Column) -> Column:
    """Adjacent token pairs joined with one space; [] for < 2 tokens.
    Both sides are sliced to length n-1 so zip_with never pads."""
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def with_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Within-document repetition signals (the Gopher-rules family of
    quality filters: heavily self-repeating documents are boilerplate
    or spam and get cut from training corpora):

    - ``n_lines``          non-empty trimmed lines
    - ``dup_line_frac``    1 - distinct_lines/lines (0 for no lines)
    - ``top_bigram_frac``  occurrences of the most frequent token
                           bigram / total bigrams (0 for < 2 tokens)

    All three are pure column expressions. The bigram mode is a
    run-length fold over the *sorted* bigram array (max run in sorted
    order == max multiplicity) — no explode/groupBy/join, zero extra
    shuffles, stays in whole-stage codegen.
    """
    c = F.coalesce(
        F.col(text_col) if isinstance(text_col, str) else text_col, F.lit("")
    )
    lines = F.filter(
        F.transform(F.split(c, "\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    n_lines = F.size(lines)
    dup_line_frac = F.when(
        n_lines > 0,
        F.lit(1.0) - F.size(F.array_distinct(lines)) / n_lines,
    ).otherwise(F.lit(0.0))

    bgs = _bigrams(tokens(c))
    zero = F.lit(0).cast("bigint")
    best_run = F.aggregate(
        F.array_sort(bgs),
        F.struct(
            F.lit("").alias("prev"),
            zero.alias("run"),
            zero.alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("bigint"))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                    F.lit(1).cast("bigint")
                ),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    top_bigram_frac = F.when(
        F.size(bgs) > 0, best_run / F.size(bgs)
    ).otherwise(F.lit(0.0))

    return (
        df.withColumn("n_lines", n_lines.cast("bigint"))
        .withColumn("dup_line_frac", dup_line_frac)
        .withColumn("top_bigram_frac", top_bigram_frac)
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_docs: int | None = None,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf·(N/df) — the
    tf-idf family with a rational idf instead of the logarithmic one:
    ranking by tf·N/df orders terms identically to tf·(N/df) under any
    monotone transform, and the score stays a single integer-ratio
    division (bit-exact across engines, no libm log variance).

    Shape: explode to (doc, term) pairs, two hash aggregations (term
    frequency per doc, document frequency per term), one broadcast-able
    join on term, then a per-doc top-k window. Skew note: df is
    bounded by N, and the DF table has one row per distinct term —
    small relative to the corpus; the join side is the aggregated DF
    table, not raw postings.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    if n_docs is None:
        # callers that know id_col is unique should pass
        # n_docs=df.count() (parquet answers it from row-group
        # metadata) and skip this scan+shuffle job
        n_docs = df.select(id_col).distinct().count()
    # df falls out of tf for free: tf has exactly one row per
    # (doc, term), so counting tf rows per term IS the document
    # frequency — no second explode over the corpus.
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    from pyspark.sql.window import Window

    scored = tf.join(docfreq, "term").withColumn(
        "score",
        (F.col("tf") * F.lit(n_docs)).cast("double") / F.col("df"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "rank")
    )


def source_term_drift(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Vocabulary drift per source: the L1 (total-variation) distance
    between each source's term-frequency distribution and the
    corpus-wide distribution — the monitor that catches a crawl split
    going off-distribution before it poisons a training mix.

    L1 rather than KL/JS: no logarithms, so every per-term contribution
    is a ratio-difference of exact integer counts computed identically
    on any engine, and the final sum accumulates through
    DECIMAL(18,12) to be order-insensitive. Shape: one explode ->
    two hash aggs (term x source, term) -> join on term (the
    aggregated vocab table, never the token stream) -> one agg per
    source. Terms absent from a source contribute their full corpus
    mass, accounted via the closing-term identity
    sum_absent p_c = 1 - sum_present p_c (no outer join needed).
    """
    toks = df.select(
        F.col(source_col).alias("src"), F.explode(tokens(text_col)).alias("term")
    )
    per_src = toks.groupBy("src", "term").agg(
        F.count(F.lit(1)).alias("n_st")
    )
    src_tot = per_src.groupBy("src").agg(F.sum("n_st").alias("tot_s"))
    corpus = per_src.groupBy("term").agg(F.sum("n_st").alias("n_t"))
    corpus_tot = corpus.agg(F.sum("n_t").alias("tot_c"))
    joined = (
        per_src.join(src_tot, "src")
        .join(F.broadcast(corpus), "term")
        .crossJoin(F.broadcast(corpus_tot))
    )
    p_s = F.col("n_st").cast("double") / F.col("tot_s")
    p_c = F.col("n_t").cast("double") / F.col("tot_c")
    term_l1 = F.abs(p_s - p_c).cast("decimal(18,12)")
    present_mass = p_c.cast("decimal(18,12)")
    return (
        joined.groupBy("src")
        .agg(
            F.sum(term_l1).alias("_l1_present"),
            F.sum(present_mass).alias("_mass_present"),
        )
        .select(
            F.col("src").alias(source_col),
            # absent terms contribute |0 - p_c| = p_c each; their total
            # is 1 - (corpus mass of the present terms)
            (
                F.col("_l1_present")
                + (F.lit(1).cast("decimal(18,12)") - F.col("_mass_present"))
            )
            .cast("double")
            .alias("l1_drift"),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 512,
    overlap: int = 0,
) -> DataFrame:
    """Split each document into overlapping token-window chunks — the
    context-window prep step for embedding / retrieval / training
    pipelines ("512-token chunks with 64-token overlap"). Pure
    codegen column expressions: tokenize once, explode a
    ``sequence(0, n_chunks-1)`` of chunk indices, and slice the token
    array per index — no UDFs, no second scan, and the explode's
    fan-out is exactly the output size (sum of chunk counts), so
    shuffle-free and linear in output.

    Chunks stride by ``chunk_tokens - overlap``; the final chunk is
    allowed to be short (no padding, no token dropped: every token
    appears in ≥1 chunk, boundary tokens in 2 when overlapping).
    Empty/whitespace-only documents produce no chunks. Output:
    (id, chunk_idx, start_token, n_chunk_tokens, chunk_text).
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(text_col)
    n = F.size(toks)
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.lit(1)
        + F.ceil(
            (n - F.lit(chunk_tokens)).cast("double") / F.lit(stride)
        ).cast("int").cast("long")
        * F.when(n > chunk_tokens, F.lit(1)).otherwise(F.lit(0))
    )
    d = df.select(
        F.col(id_col), toks.alias("_toks"), n_chunks.alias("_nc")
    ).where(F.col("_nc") > 0)
    exploded = d.select(
        id_col,
        "_toks",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("_nc") - 1)
        ).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * stride
    piece = F.slice(
        F.col("_toks"), (start + 1).cast("int"), chunk_tokens
    )
    return exploded.select(
        id_col,
        "chunk_idx",
        start.alias("start_token"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# Bigram language-model fluency scoring
# ---------------------------------------------------------------------------

# fixed-point scale for per-position probabilities (p <= 1, so each
# quantized term is <= 2^20; a billion-token document still sums far
# inside int64)
LM_FP_SCALE = 1 << 20


def lm_fluency(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-self-trained bigram LM fluency score per document — the
    KenLM-style quality-filter signal (docs whose word transitions are
    improbable under the corpus's own bigram statistics score low:
    boilerplate, shuffled text, lorem-ipsum, OCR noise).

    Model: add-one-smoothed bigram probability
        P(w_i | w_{i-1}) = (c(w_{i-1} w_i) + 1) / (c(w_{i-1}) + V)
    averaged over the document's positions. Probabilities are averaged
    directly (not log-summed): the ordering is a fluency proxy either
    way, and staying rational keeps every per-position term one
    exactly-rounded IEEE division — engine-portable, where ln() is
    libm-dependent (same trade as the rational tf-idf).

    Determinism: each position's probability is quantized to
    fixed-point (floor(p * 2^20)) BEFORE the per-doc sum, so the
    aggregate is an order-free integer sum; the final score is one
    division by the position count.

    Scale shape: O(corpus tokens) end to end — the corpus bigram/
    unigram tables are aggregates (vocabulary-bounded), the per-
    position join keys on the bigram (fan-out exactly 1 since the
    model is self-trained), V reduces to one broadcast row, and the
    per-doc reduction is an ordinary partial-aggregated groupBy.
    Documents with < 2 tokens get n_bigrams = 0 and a NULL score.

    Returns (id_col, n_bigrams, lm_score).
    """
    toks = docs.select(F.col(id_col), tokens(text_col).alias("_w"))
    uni = (
        toks.select(F.explode("_w").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("_cu"))
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("_v"))
    # CASE guard: Spark's sequence(1, 0) DESCENDS ([1, 0]) instead of
    # returning empty, which would fabricate null-padded bigrams for
    # 0/1-token documents
    bigram = F.expr(
        "CASE WHEN size(_w) < 2 THEN array() "
        "ELSE transform(sequence(1, size(_w) - 1), "
        "i -> struct(_w[i-1] AS w1, _w[i] AS w2)) END"
    )
    doc_bi = toks.select(
        F.col(id_col), F.explode(bigram).alias("_bg")
    ).select(id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))
    bi_counts = doc_bi.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("_cb")
    )
    p = (F.col("_cb").cast("double") + F.lit(1.0)) / (
        F.col("_cu").cast("double") + F.col("_v").cast("double")
    )
    # uni is vocabulary-sized: small enough for AQE to broadcast at
    # test SF, but a 100 TB corpus vocabulary can be 10^7+ rows — left
    # un-hinted so the optimizer picks from runtime stats
    scored = (
        doc_bi.join(bi_counts, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.floor(p * F.lit(float(LM_FP_SCALE)))
            .cast("bigint")
            .alias("_p_fp"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("_p_fp").alias("_sum_fp"),
        )
    )
    base = toks.select(F.col(id_col))
    return (
        base.join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0))
            .cast("bigint")
            .alias("n_bigrams"),
            (
                (
                    F.col("_sum_fp").cast("double")
                    / F.col("n_bigrams").cast("double")
                )
                / F.lit(float(LM_FP_SCALE))
            ).alias("lm_score"),
        )
    )


# ---------------------------------------------------------------------------
# PII scrubbing (round 7)
# ---------------------------------------------------------------------------

# Redaction patterns chosen to parse identically under Java regex
# (Spark codegen) and RE2 (the DuckDB oracle): character classes,
# bounded repeats, and \b word boundaries only — no lookaround, no
# backreferences, which RE2 rejects.
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_IPV4_RE = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
PII_PHONE_RE = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

# Applied email -> IPv4 -> phone: the email class swallows dotted
# digits left of an '@' before the IP pattern can see them. IP-vs-
# phone order is fixed for determinism but can't change the result: a
# valid dotted quad never half-parses as a phone (the final phone
# group needs exactly 4 digits followed by \b, an octet has at most
# 3 — pinned by test_pii_scrub_ip_not_double_counted_as_phone). Both
# engines apply leftmost-earliest non-overlapping replacement, so the
# composed output is identical on both sides.
_PII_ORDER: tuple[tuple[str, str], ...] = (
    (PII_EMAIL_RE, "<EMAIL>"),
    (PII_IPV4_RE, "<IP>"),
    (PII_PHONE_RE, "<PHONE>"),
)


def scrub_pii(col: Column | str) -> Column:
    """Text with emails, IPv4 addresses, and NNN-NNN-NNNN / dotted
    phone numbers replaced by typed redaction tags. One codegen pass —
    three chained regexp_replace ops, no shuffle, no Python — so it
    runs at scan speed over a 100 TB corpus."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, tag in _PII_ORDER:
        c = F.regexp_replace(c, pat, tag)
    return c


def pii_counts(col: Column | str) -> tuple[Column, Column, Column]:
    """(n_emails, n_ips, n_phones) found in the raw text, counted on
    the same patterns (and the same order-of-precedence: each count is
    taken on the text with the earlier categories already redacted, so
    a dotted quad is never double-counted as a phone)."""
    c = F.col(col) if isinstance(col, str) else col
    counts = []
    for pat, tag in _PII_ORDER:
        counts.append(
            F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).cast("bigint")
        )
        c = F.regexp_replace(c, pat, tag)
    return counts[0], counts[1], counts[2]


def with_compression_ratio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Deflate-compression quality signal per document: byte length of
    the UTF-8 text, its zlib-compressed length at a FIXED level, and
    the compression ratio — the classic repetition detector
    (Gopher/MassiveText-style filters drop documents whose bytes
    compress too well, boilerplate and log spew, and sometimes those
    that barely compress at all, binary noise). Returns
    ``(id, n_raw_bytes, n_deflate_bytes, deflate_ratio)``;
    ``deflate_ratio`` is NULL for empty text.

    Compression is not expressible in Spark SQL, so this is a
    documented slow-path operator: ``mapInPandas`` over ONLY the
    (id, text) projection — Arrow-batched columnar transfer, zlib at a
    pinned level so results are deterministic across runs and
    partitionings (pytest pins a direct-zlib differential). Work is
    embarrassingly parallel per batch and memory is bounded by the
    Arrow batch size; at 100 TB this scans once with no shuffle.
    """
    schema = (
        f"{id_col} bigint, n_raw_bytes bigint, n_deflate_bytes bigint, "
        "deflate_ratio double"
    )

    def batches(it):
        import zlib

        import pandas as pd

        for pdf in it:
            raw = pdf[text_col].fillna("").map(
                lambda s: s.encode("utf-8", errors="surrogatepass")
            )
            n_raw = raw.map(len)
            n_def = raw.map(lambda b: len(zlib.compress(b, level)))
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_raw_bytes": n_raw,
                    "n_deflate_bytes": n_def,
                }
            )
            out["deflate_ratio"] = out["n_deflate_bytes"] / out[
                "n_raw_bytes"
            ].where(out["n_raw_bytes"] > 0)
            yield out

    return df.select(id_col, text_col).mapInPandas(batches, schema)


# ---------------------------------------------------------------------------
# BPE tokenizer training (round 9): Sennrich-style merge learning
# ---------------------------------------------------------------------------


def merge_adjacent_pair(
    symbols: Column | str, left: str, right: str, merged: str
) -> Column:
    """Apply ONE BPE merge rule to a symbol array, left-to-right: every
    adjacent (left, right) occurrence becomes ``merged``. The fold
    keeps an output accumulator and greedily replaces its LAST element
    when (last, current) matches — which is exactly left-to-right
    non-overlapping merging: after a replacement the last element is
    the merged token, which can never equal ``left``'s bare form, so
    overlapping occurrences ("aaa" under (a,a) -> [aa, a]) resolve the
    way a sequential scan does. Pure codegen (no UDF); the leading
    WHEN guards the ANSI-mode element_at(-1) on an empty accumulator
    (CASE branches evaluate lazily per row)."""
    col = F.col(symbols) if isinstance(symbols, str) else symbols
    return _merge_adjacent_impl(col, left, right, merged)


def _merge_adjacent_impl(col: Column, a: str, b: str, m: str) -> Column:
    def step(acc: Column, x: Column) -> Column:
        return (
            F.when(F.size(acc) == 0, F.array(x))
            .when(
                (F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(m))
                ),
            )
            .otherwise(F.concat(acc, F.array(x)))
        )

    return F.aggregate(
        col, F.expr("cast(array() as array<string>)"), step
    )


@with_coalesced_cached_rounds
def bpe_learn_merges(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Learn the first ``n_merges`` byte-pair-encoding merges over the
    corpus (Sennrich et al. 2016): repeatedly count adjacent symbol
    pairs weighted by word frequency, merge the most frequent pair
    (count desc, then lexicographic (left, right) for determinism),
    and rewrite the vocabulary. Returns the merge table
    ``(rank, left, right, merged, weight)``.

    Scale shape — the whole loop runs on the DISTINCT VOCABULARY
    (word -> corpus count), never the token stream: one corpus-sized
    hash-agg up front, then every iteration's pair count and rewrite
    touch |vocab| rows (Heaps' law: sublinear in corpus size — the
    same contract as doc_bpe_pair_counts). Each round's rewritten
    vocabulary is persisted and materialized so the n_merges-deep
    fold lineage never re-executes end-to-end; the only driver-side
    data is ONE argmax row per round.

    Reference parity: the reference has no tokenizer training; this is
    the training-data-pipeline extension (SURVEY §2.10 class)."""
    spark = docs.sparkSession
    vocab = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cur = vocab.select(
        "n",
        F.expr("filter(split(w, ''), x -> x <> '')").alias("s"),
    ).persist()
    merges: list[tuple] = []
    # Round cadence (r14 optimization, guide §1.2 "remove passes"):
    # ONE job per round. The argmax action below is the FIRST touch of
    # the round's persisted frame, so it doubles as the cache fill —
    # the former explicit ``nxt.count()`` materialization job re-read
    # the whole vocabulary once per round for nothing. Dropping it
    # requires keeping the PARENT of any still-lazy child cached: an
    # eager unpersist of the direct parent would cascade a full
    # lineage recompute. A 2-deep sliding window suffices (r15, guide
    # §5 "unpersist when done" — the r14 version held ALL rounds'
    # frames until the loop ended, O(n_merges × vocab) residency):
    # once round r's argmax action has materialized frame r-1's
    # cache, frame r-2 is no longer needed by any still-lazy plan and
    # releases immediately (non-cascading unpersist keeps r-1's
    # already-built cache valid). The window (at most 2 frames)
    # releases in ``finally``.
    frames = [cur]
    try:
        for r in range(1, n_merges + 1):
            pair_struct = F.expr(
                "transform(sequence(1, size(s) - 1), "
                "i -> struct(element_at(s, i) AS l, "
                "element_at(s, i + 1) AS r))"
            )
            top = (
                cur.where(F.size("s") >= 2)
                .select(F.explode(pair_struct).alias("p"), "n")
                .groupBy("p.l", "p.r")
                .agg(F.sum("n").alias("weight"))
                .orderBy(
                    F.col("weight").desc(),
                    F.col("l").asc(),
                    F.col("r").asc(),
                )
                .limit(1)
                .collect()
            )
            # the argmax materialized cur (= frames[-1]); its parent
            # has no remaining lazy reader — release it
            if len(frames) >= 2:
                frames.pop(0).unpersist()
            if not top:
                break
            a, b, w = top[0]["l"], top[0]["r"], int(top[0]["weight"])
            merged = a + b
            merges.append((r, a, b, merged, w))
            nxt = cur.withColumn(
                "s", _merge_adjacent_impl(F.col("s"), a, b, merged)
            ).persist()
            frames.append(nxt)
            cur = nxt
    finally:
        for f in frames:
            f.unpersist()
    return spark.createDataFrame(
        merges,
        "rank long, left string, right string, merged string, "
        "weight long",
    )


@with_coalesced_cached_rounds
def apply_bpe(
    docs: DataFrame,
    merges,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    *,
    id_col: str | None = None,
    merges_per_stage: int = 8,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Tokenize the CORPUS with a learned BPE merge table — the apply
    half of ``bpe_learn_merges`` (learn → tokenize → pack completes
    the training-data pipeline; packing is ``doc_pack_sequences``).

    ``merges`` is the learner's output frame (rank, left, right,
    merged, ...) or an already-ordered list of (left, right, merged)
    tuples; a merge TABLE is control-plane data (tens to a few
    thousand rows), so collecting it to drive expression construction
    is the sanctioned bounded collect.

    Scale shape — the fold runs on the DISTINCT VOCABULARY, never the
    token stream (Heaps' law, the learner's own trick): one
    corpus-sized hash-agg builds word -> symbol list, the merge list
    folds over those |vocab| rows via the same codegen'd
    merge-adjacent expression the learner uses (chunked
    ``merges_per_stage`` per select, with persist/materialize between
    chunks, so codegen depth and lineage stay bounded for
    thousand-merge tables), and ONE join maps each word occurrence to
    its token list. Per-doc sequences reassemble by word position —
    posexplode + array_sort(collect_list(struct)), no window.

    ``broadcast_vocab=False`` swaps the vocab broadcast for a shuffle
    join — required when the corpus vocabulary outgrows executor
    memory (a web-scale corpus' vocab is Heaps-sublinear but still
    ~10^8 words at 100 TB).

    ``id_col`` names a UNIQUE key of ``docs``: the token stream then
    carries ONLY (id, position, word) through the explode, the
    mapping join, and the reassembly shuffle, and the other doc
    columns re-attach with one id equi-join at the end. Without it
    the operator groups by every doc column, which drags the full
    document text through the token-level shuffle — fine for narrow
    frames, a corpus-tokens × doc-size blowup on real documents, so
    pass the key whenever one exists.

    Returns one row per input doc: every original column of ``docs``
    plus ``out_col`` (array<string>, the BPE token sequence in word
    order). Rows whose text has no tokens get an empty array.
    """
    if isinstance(merges, DataFrame):
        merge_rows = [
            (r["left"], r["right"], r["merged"])
            for r in merges.orderBy("rank").collect()
        ]
    else:
        merge_rows = [tuple(m)[:3] for m in merges]

    toks = tokens(text_col)
    if id_col is not None:
        exploded = docs.select(
            F.col(id_col),
            F.posexplode_outer(toks).alias("_bpe_pos", "_bpe_w"),
        )
    else:
        exploded = docs.select(
            F.col("*"),
            F.posexplode_outer(toks).alias("_bpe_pos", "_bpe_w"),
        )
    vocab = (
        exploded.where(F.col("_bpe_w").isNotNull())
        .select(F.col("_bpe_w").alias("_bpe_word"))
        .distinct()
        .withColumn(
            "_bpe_syms",
            F.expr("filter(split(_bpe_word, ''), x -> x <> '')"),
        )
    )
    staged: list[DataFrame] = []
    for i in range(0, len(merge_rows), max(merges_per_stage, 1)):
        chunk = merge_rows[i:i + max(merges_per_stage, 1)]
        col = F.col("_bpe_syms")
        for a, b, m in chunk:
            col = _merge_adjacent_impl(col, a, b, m)
        vocab = vocab.withColumn("_bpe_syms", col)
        if i + merges_per_stage < len(merge_rows):
            vocab = vocab.persist()
            vocab.count()
            staged.append(vocab)
    try:
        mapped = exploded.join(
            F.broadcast(vocab) if broadcast_vocab else vocab,
            exploded["_bpe_w"].eqNullSafe(vocab["_bpe_word"]),
            "left",
        )
        doc_cols = [id_col] if id_col is not None else list(docs.columns)
        reassembled = (
            mapped.groupBy(*doc_cols)
            .agg(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.col("_bpe_pos").alias("p"),
                                    F.col("_bpe_syms").alias("s"),
                                )
                            )
                        ),
                        lambda st: st["s"],
                    )
                ).alias(out_col)
            )
            .withColumn(
                out_col,
                F.coalesce(
                    F.col(out_col), F.array().cast("array<string>")
                ),
            )
        )
        if id_col is not None:
            # token-level shuffles carried only (id, pos, word);
            # everything else re-attaches here, once per doc
            reassembled = docs.join(reassembled, id_col, "left")
            reassembled = reassembled.withColumn(
                out_col,
                F.coalesce(
                    F.col(out_col), F.array().cast("array<string>")
                ),
            )
        if staged:
            reassembled = reassembled.persist()
            reassembled.count()
        return reassembled
    finally:
        for s in staged:
            s.unpersist()


def bpe_vocab_ids(
    toked: DataFrame,
    tokens_col: str = "bpe_tokens",
    id_col: str = "token_id",
) -> DataFrame:
    """Deterministic integer-id assignment over an applied-BPE token
    vocabulary: id = 0-based rank by (corpus occurrence count DESC,
    token ASC) — the one order both engines (and a re-run months
    later) can state, so the id table is a reproducible training
    artifact, not an accident of partitioning. Returns
    ``(token, token_id, n)`` with ``n`` the corpus occurrence count.

    Completes learn → apply → IDS: ``bpe_learn_merges`` produces the
    merge table, ``apply_bpe`` the token sequences, this the integer
    ids a trainer consumes (``doc_pack_sequences`` packs from there).

    Scale shape: one token-level hash-agg (map-side combined) builds
    the vocabulary counts — the only corpus-sized pass; the ranking
    runs over |vocab| rows (Heaps-sublinear) through the engine's
    distributed ordered-prefix pass (quantile buckets on the negated
    count → per-bucket running row count → ≤n_buckets-row carry), so
    a 10^8-token web-corpus vocabulary never serializes onto one
    window task."""
    from .ranking import with_ordered_prefix

    occ = (
        toked.select(F.explode(tokens_col).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .withColumn("_neg_n", -F.col("n"))
    )
    ranked = with_ordered_prefix(
        occ,
        "_neg_n",
        [F.col("_neg_n"), F.col("token")],
        {"_rk": F.lit(1)},
    )
    return ranked.select(
        "token",
        (F.col("_rk") - 1).cast("bigint").alias(id_col),
        "n",
    )


# ---------------------------------------------------------------------------
# Count-min sketch (round 14): explicit-arithmetic frequency sketch
# ---------------------------------------------------------------------------

CMS_D = 4
CMS_W = 512


def cms_build_tokens(
    df: DataFrame,
    text_col: str = "text",
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Count-min sketch over whitespace-token OCCURRENCES (with
    multiplicity — a frequency sketch, unlike the membership Bloom):
    ``d`` counter rows of ``w`` buckets, token t incrementing bucket
    ``(h1(t) + j·h2(t)) mod w`` in every row j — the same explicit
    double polynomial hashing as ``dedup.bloom_build_ngrams``, so any
    engine restates every counter bit-for-bit. Returns the sketch AS
    DATA: ``(row, bucket, cnt)`` for the non-zero cells (≤ d·w rows —
    fixed-size and broadcastable at ANY corpus size, the sketch
    contract).

    Scale shape: explode tokens → two codegen hash folds per token →
    one (row, bucket) hash-agg with map-side combine. The sketch is
    mergeable by cell-wise addition (pytest-pinned), so per-partition
    sketches union by a second trivial agg — the 100 TB rollup path."""
    from .dedup import _BLOOM_B1, _BLOOM_B2, _BLOOM_P1, _BLOOM_P2, _gram_hash

    toks = df.select(
        F.explode(tokens(text_col)).alias("tok")
    )
    h1 = _gram_hash(F.col("tok"), _BLOOM_B1, _BLOOM_P1)
    h2 = _gram_hash(F.col("tok"), _BLOOM_B2, _BLOOM_P2)
    rows = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(d - 1)),
                lambda j: F.struct(
                    j.cast("int").alias("row"),
                    ((h1 + j * h2) % w).cast("int").alias("bucket"),
                ),
            )
        ).alias("rb")
    )
    return (
        rows.select("rb.row", "rb.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_estimate(
    terms: DataFrame,
    sketch: DataFrame,
    term_col: str = "token",
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Point-query the sketch for each term: est = min over the d
    probed counters — the CMS guarantee est ≥ true count (equality
    unless the term collided in every row). One explode to (term,
    row, bucket), one equi-join against the ≤ d·w sketch cells, one
    min-agg per term; missing cells count 0 (term never seen)."""
    from .dedup import _BLOOM_B1, _BLOOM_B2, _BLOOM_P1, _BLOOM_P2, _gram_hash

    h1 = _gram_hash(F.col(term_col), _BLOOM_B1, _BLOOM_P1)
    h2 = _gram_hash(F.col(term_col), _BLOOM_B2, _BLOOM_P2)
    probes = terms.select(
        term_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(d - 1)),
                lambda j: F.struct(
                    j.cast("int").alias("row"),
                    ((h1 + j * h2) % w).cast("int").alias("bucket"),
                ),
            )
        ).alias("rb"),
    ).select(term_col, "rb.row", "rb.bucket")
    return (
        probes.join(sketch, ["row", "bucket"], "left")
        .groupBy(term_col)
        .agg(
            F.min(F.coalesce("cnt", F.lit(0)))
            .cast("bigint")
            .alias("est_cnt")
        )
    )
