"""Keyword retrieval over the document corpus: BM25 top-k.

The reference has no search surface, but a curation pipeline constantly
asks "which documents best match these terms" (eval-set mining, targeted
inspection, quality probes). This is the classic Okapi BM25 ranking
(Robertson & Spärck Jones lineage — public literature), expressed as a
single declarative Spark plan:

    one scan -> tokenize (codegen) -> explode -> FILTER to query terms
    -> per-(doc, term) tf -> per-term df -> score -> top-k

Scale posture:

- The explode is filtered to the query's terms *immediately*, so the
  shuffled postings list is O(matching postings), not O(corpus tokens).
- Document length and the corpus-wide (N, avgdl) aggregates come from
  the same tokenized scan; N and avgdl reduce to one broadcastable row.
- df per query term is a tiny aggregate (≤ |query| rows, broadcast
  into the scoring join by AQE).
- Final ranking is ORDER BY + LIMIT → TakeOrderedAndProject; nothing
  driver-side.

Determinism engineering (oracle-portability, same idea as the rational
tf-idf in ``textops.tfidf_top_terms``): the usual ``ln`` idf is
libm-dependent across engines, so scoring uses the *rational* idf
``(N - df + 0.5) / (df + 0.5)`` (same per-term ordering as the log
form, one exactly-rounded IEEE division), and per-term scores are
quantized to fixed-point (floor(score * 2^20)) BIGINTs before the
cross-term sum — integer addition is order-free, so the aggregate is
bit-identical regardless of partitioning. The public BM25 term-shape
``tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` is kept verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .textops import tokens

# fixed-point scale for the order-free cross-term sum (2^20 keeps the
# quantized score exactly representable and leaves ~43 bits of headroom)
FP_SCALE = 1 << 20


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for ``query_terms`` under rational-idf BM25.

    Returns (id_col, score_fp, rank): ``score_fp`` is the fixed-point
    score (sum of floor(term_score * 2^20)); rank breaks exact-score
    ties by ascending id for a deterministic result set.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toked = docs.select(
        F.col(id_col), tokens(text_col).alias("_toks")
    ).select(
        F.col(id_col),
        F.size("_toks").alias("_dl"),
        F.col("_toks"),
    )
    # corpus stats: one broadcastable row (N, avgdl)
    stats = toked.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        F.sum("_dl").alias("_sum_dl"),
    )
    # postings restricted to the query terms before any shuffle —
    # persisted: they feed both the df-per-term aggregate and the
    # scoring join, and each unpersisted derivation re-tokenized the
    # corpus (r14 optimization, guide §5; the frame is bounded by the
    # query terms' frequencies, not corpus tokens). Released after
    # the bounded top-k result materializes below.
    postings = (
        toked.select(
            F.col(id_col), F.col("_dl"), F.explode("_toks").alias("term")
        )
        .where(F.col("term").isin(list(query_terms)))
        .groupBy(id_col, "_dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    df_per_term = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    # score each (doc, term): doubles derived from exact integers with a
    # fixed expression order -> bit-identical across engines
    n = F.col("_n_docs").cast("double")
    avgdl = F.col("_sum_dl").cast("double") / F.col("_n_docs").cast("double")
    tf = F.col("tf").cast("double")
    dfq = F.col("df").cast("double")
    dl = F.col("_dl").cast("double")
    idf = (n - dfq + F.lit(0.5)) / (dfq + F.lit(0.5))
    term_score = idf * (
        (tf * F.lit(k1 + 1.0))
        / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / avgdl))
    )
    scored = (
        postings.join(F.broadcast(df_per_term), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.floor(term_score * F.lit(float(FP_SCALE)))
            .cast("bigint")
            .alias("_term_fp"),
        )
        .groupBy(id_col)
        .agg(F.sum("_term_fp").alias("score_fp"))
    )
    # ORDER BY + LIMIT plans as TakeOrderedAndProject; the row_number
    # window then runs over only the k surviving rows
    ranked = scored.orderBy(
        F.col("score_fp").desc(), F.col(id_col)
    ).limit(k)
    w = Window.orderBy(F.col("score_fp").desc(), F.col(id_col))
    try:
        res = ranked.withColumn(
            "rank", F.row_number().over(w).cast("bigint")
        ).persist()
        res.count()
        return res
    finally:
        postings.unpersist()


def bm25_topk_batch(
    docs: DataFrame,
    queries_df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BATCH retrieval: per-query BM25 top-k for a whole query SET in
    one distributed plan — the retrieval twin of the batch ANN join
    (operators/similarity.py): scoring work is shared across queries
    instead of one Spark job per query.

    ``queries_df`` is (query_id, terms array<string>), small relative
    to the corpus (it broadcasts). The plan:

    1. union vocabulary = distinct terms over all queries (tiny);
    2. postings = tokenize -> explode -> LEFT-SEMI broadcast join on
       the vocabulary (the corpus token stream is cut to matching
       postings BEFORE any shuffle — term lists stay dynamic, no
       literal IN list);
    3. per-(doc, term) tf and per-term df over the union vocabulary —
       each term is scored ONCE per doc, even when many queries share
       it;
    4. fixed-point per-term scores (same rational-idf arithmetic as
       ``bm25_topk``) broadcast-join the (query, term) pairs, then an
       order-free integer sum per (query, doc);
    5. per-query ranking as a rank-filter window — Catalyst pushes
       WindowGroupLimit, so each partition forwards O(k) rows per
       query, never its full candidate set.

    Returns (query_id, doc_id-named id_col, score_fp, rank), rank<=k.
    """
    qterms = queries_df.select(
        F.col(query_id_col), F.explode(terms_col).alias("term")
    ).distinct()
    vocab = qterms.select("term").distinct()
    toked = docs.select(
        F.col(id_col), tokens(text_col).alias("_toks")
    ).select(F.col(id_col), F.size("_toks").alias("_dl"), "_toks")
    stats = toked.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        F.sum("_dl").alias("_sum_dl"),
    )
    # persisted for the same reason as the single-query path: the
    # df-per-term aggregate and the scoring join both derive from it,
    # and each unpersisted derivation re-tokenized the corpus (r14
    # optimization, guide §5; bounded by the batch vocabulary's
    # term frequencies). Released after the k-bounded result
    # materializes below.
    postings = (
        toked.select(
            F.col(id_col), F.col("_dl"), F.explode("_toks").alias("term")
        )
        .join(F.broadcast(vocab), "term", "left_semi")
        .groupBy(id_col, "_dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    df_per_term = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    n = F.col("_n_docs").cast("double")
    avgdl = F.col("_sum_dl").cast("double") / F.col("_n_docs").cast("double")
    tf = F.col("tf").cast("double")
    dfq = F.col("df").cast("double")
    dl = F.col("_dl").cast("double")
    idf = (n - dfq + F.lit(0.5)) / (dfq + F.lit(0.5))
    term_score = idf * (
        (tf * F.lit(k1 + 1.0))
        / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / avgdl))
    )
    term_fp = (
        postings.join(F.broadcast(df_per_term), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            F.col(id_col),
            F.floor(term_score * F.lit(float(FP_SCALE)))
            .cast("bigint")
            .alias("_term_fp"),
        )
    )
    scored = (
        term_fp.join(F.broadcast(qterms), "term")
        .groupBy(query_id_col, id_col)
        .agg(F.sum("_term_fp").alias("score_fp"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score_fp").desc(), F.col(id_col)
    )
    try:
        res = (
            scored.withColumn(
                "rank", F.row_number().over(w).cast("bigint")
            )
            .where(F.col("rank") <= k)
            .persist()
        )
        res.count()
        return res
    finally:
        postings.unpersist()


def phrase_search(
    df: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact token-phrase search via positional postings: documents
    containing ``phrase`` as consecutive whitespace tokens, with the
    occurrence count and first (0-based) start position.

    The inverted-index formulation: one tokenized scan, postings
    FILTERED to the phrase's terms before any shuffle (volume is the
    phrase terms' frequencies, not corpus tokens), then |phrase|-1
    equi-joins on (doc, start-position) — term i's postings shift
    their position by -i so every term of one occurrence lands on the
    same join key. Phrase length is a query-time constant (single
    digits), so the join chain is bounded; a LIKE-style scan touches
    every byte of every document instead.

    Duplicate terms in the phrase are fine: each join matches the
    shifted position, so "go go" finds exactly the consecutive pairs.
    """
    if not phrase:
        raise ValueError("phrase must have at least one term")
    toks = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("_pos", "_tok")
    ).where(F.col("_tok").isin(*phrase))
    starts = toks.where(F.col("_tok") == phrase[0]).select(id_col, "_pos")
    for i, term in enumerate(phrase[1:], start=1):
        nxt = toks.where(F.col("_tok") == term).select(
            F.col(id_col), (F.col("_pos") - i).alias("_pos")
        )
        starts = starts.join(nxt, [id_col, "_pos"])
    return starts.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.min("_pos").alias("first_pos"),
    )
