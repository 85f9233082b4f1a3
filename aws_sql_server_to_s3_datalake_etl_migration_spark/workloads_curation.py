"""Curation & profiling workloads (round 6): fuzzy record linkage,
BM25 retrieval, event-path transitions, cross-source contamination,
column profiling, group-wise trend fits, and embedding quantization.

Same oracle-differential rules as workloads.py: every aggregate is
aliased identically on both sides; floating-point outputs are either
single exactly-rounded IEEE operations over exact integers/decimals or
fixed-point-quantized before any order-sensitive sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .operators import (
    linkage,
    profile,
    quantize,
    retrieval,
    similarity,
    textops,
    timeseries,
)
from .operators.dedup import word_shingles
from .registry import register
from .sources.readers import read_table_dir
from .workloads import _events
from .workloads_llm import _docs, _embs, _query_vec

# ---------------------------------------------------------------------------
# Fuzzy record linkage: exact Levenshtein<=1 self-join, no cross join
# ---------------------------------------------------------------------------


@register(
    "customer_name_neardup_pairs",
    """
    SELECT a.c_custkey AS left_id, b.c_custkey AS right_id,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
    FROM customer a, customer b
    WHERE a.c_custkey < b.c_custkey
      AND levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def customer_name_neardup_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """All customer-name pairs within edit distance 1 via the
    deletion-neighborhood blocking join (operators/linkage.py) — the
    oracle is the O(n^2) cross join this operator exists to avoid."""
    cust = read_table_dir(spark, sf_dir, "customer")
    return linkage.edit_distance_self_join(
        cust, "c_custkey", "c_name", max_distance=1
    )


# ---------------------------------------------------------------------------
# BM25 keyword retrieval (rational idf + fixed-point order-free sum)
# ---------------------------------------------------------------------------

_BM25_TERMS = ["spark", "join", "window"]
_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    k1p1 = repr(_BM25_K1 + 1.0)
    k1 = repr(_BM25_K1)
    one_minus_b = repr(1.0 - _BM25_B)
    b = repr(_BM25_B)
    scale = repr(float(retrieval.FP_SCALE))
    return f"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+') END AS w
      FROM documents
    ),
    docs AS (SELECT doc_id, len(w) AS dl, w FROM toks),
    stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM docs),
    posts AS (
      SELECT doc_id, dl, t.term, COUNT(*) AS tf
      FROM docs, unnest(w) AS t(term)
      WHERE t.term IN ({terms})
      GROUP BY 1, 2, 3
    ),
    dfs AS (SELECT term, COUNT(*) AS df FROM posts GROUP BY 1),
    scored AS (
      SELECT p.doc_id,
        CAST(SUM(CAST(FLOOR(
          (((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
            / (CAST(df AS DOUBLE) + 0.5))
           * ((CAST(tf AS DOUBLE) * {k1p1})
              / (CAST(tf AS DOUBLE)
                 + {k1} * ({one_minus_b}
                           + {b} * CAST(dl AS DOUBLE)
                             / (CAST(sum_dl AS DOUBLE)
                                / CAST(n_docs AS DOUBLE))))))
          * {scale}) AS BIGINT)) AS BIGINT) AS score_fp
      FROM posts p JOIN dfs USING (term) CROSS JOIN stats
      GROUP BY 1
    )
    SELECT doc_id, score_fp,
           CAST(ROW_NUMBER() OVER (ORDER BY score_fp DESC, doc_id)
                AS BIGINT) AS rank
    FROM scored ORDER BY score_fp DESC, doc_id LIMIT 10
    """


@register("doc_bm25_search", _bm25_oracle())
def doc_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents for a 3-term keyword query under rational-idf
    BM25 (operators/retrieval.py) — postings filtered to the query's
    terms before any shuffle; ranking is TakeOrderedAndProject."""
    return retrieval.bm25_topk(
        _docs(spark, sf_dir),
        _BM25_TERMS,
        k=10,
        k1=_BM25_K1,
        b=_BM25_B,
    )


# ---------------------------------------------------------------------------
# Event-path transition matrix (Markov next-event counts)
# ---------------------------------------------------------------------------


@register(
    "event_transition_matrix",
    """
    WITH seq AS (
      SELECT event_type AS src_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS dst_type
      FROM events
    ),
    t AS (
      SELECT src_type, dst_type, COUNT(*) AS n_transitions
      FROM seq WHERE dst_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT src_type, dst_type, n_transitions,
           CAST(n_transitions AS DOUBLE)
           / CAST(SUM(n_transitions) OVER (PARTITION BY src_type)
                  AS DOUBLE) AS p_transition
    FROM t
    """,
)
def event_transition_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-user next-event transition counts + row-normalized Markov
    probabilities. The lead() window shuffles once on user_id; the
    normalizing window runs over the |types|^2-row aggregate only.
    Tie-broken by event_id so the sequence (and thus the matrix) is
    deterministic under timestamp collisions."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src_type"),
        F.lead("event_type").over(w).alias("dst_type"),
    ).where(F.col("dst_type").isNotNull())
    t = seq.groupBy("src_type", "dst_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    norm = Window.partitionBy("src_type")
    return t.select(
        "src_type",
        "dst_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(norm).cast("double")
        ).alias("p_transition"),
    )


# ---------------------------------------------------------------------------
# Cross-source n-gram overlap matrix (contamination between crawls)
# ---------------------------------------------------------------------------


@register(
    "doc_source_overlap",
    """
    WITH toks AS (
      SELECT source,
             CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+') END AS w
      FROM documents
    ),
    grams AS (
      SELECT source,
             unnest(list_distinct(
               CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                    ELSE list_transform(range(1, len(w) - 1),
                                        i -> array_to_string(w[i:i+2], ' '))
               END)) AS gram
      FROM toks
    ),
    sposts AS (SELECT DISTINCT source, gram FROM grams),
    sizes AS (SELECT source, COUNT(*) AS n FROM sposts GROUP BY 1),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             COUNT(*) AS n_shared
      FROM sposts a JOIN sposts b USING (gram)
      WHERE a.source < b.source
      GROUP BY 1, 2
    )
    SELECT source_a, source_b, n_shared,
           CAST(n_shared AS DOUBLE)
           / CAST(sa.n + sb.n - n_shared AS DOUBLE) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.source = source_a
    JOIN sizes sb ON sb.source = source_b
    """,
)
def doc_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise 3-gram Jaccard between SOURCES — which crawls/feeds
    duplicate each other. The postings self-join fans out at most
    |sources| per gram (bounded by construction, like the drift
    monitor); the matrix is |sources|^2 rows of aggregates."""
    docs = _docs(spark, sf_dir)
    sposts = (
        docs.select(
            "source", F.explode(word_shingles("text", 3)).alias("gram")
        )
        .distinct()
    )
    sizes = sposts.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = sposts.select(
        F.col("source").alias("source_a"), "gram"
    )
    b = sposts.select(
        F.col("source").alias("source_b"), "gram"
    )
    pairs = (
        a.join(b, "gram")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(
        F.col("source").alias("source_a"), F.col("n").alias("_na")
    )
    sb = sizes.select(
        F.col("source").alias("source_b"), F.col("n").alias("_nb")
    )
    return (
        pairs.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            (
                F.col("n_shared").cast("double")
                / (F.col("_na") + F.col("_nb") - F.col("n_shared")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# One-pass column profiler
# ---------------------------------------------------------------------------

_PROFILE_COLS = (
    ("o_orderkey", "CAST({m}(o_orderkey) AS VARCHAR)"),
    ("o_custkey", "CAST({m}(o_custkey) AS VARCHAR)"),
    ("o_orderstatus", "CAST({m}(o_orderstatus) AS VARCHAR)"),
    (
        "o_totalprice",
        "CAST(CAST({m}(o_totalprice) AS DECIMAL(18,4)) AS VARCHAR)",
    ),
    (
        "o_orderdate",
        "strftime({m}(o_orderdate), '%Y-%m-%d %H:%M:%S')",
    ),
    ("o_orderpriority", "CAST({m}(o_orderpriority) AS VARCHAR)"),
)


def _profile_oracle() -> str:
    parts = []
    for name, fmt in _PROFILE_COLS:
        parts.append(
            f"""
    SELECT '{name}' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({name}) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {name}) AS BIGINT) AS n_distinct,
           {fmt.format(m='MIN')} AS min_value,
           {fmt.format(m='MAX')} AS max_value
    FROM orders"""
        )
    return " UNION ALL ".join(parts)


@register("orders_column_profile", _profile_oracle())
def orders_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null/cardinality/range profile of every orders column in ONE
    scan (operators/profile.py) — the oracle re-scans per column; the
    engine does not."""
    return profile.profile_columns(read_table_dir(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# Group-wise OLS trend (map-side-combinable sufficient statistics)
# ---------------------------------------------------------------------------


@register(
    "events_value_trend",
    """
    WITH pts AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                  AS DECIMAL(18,0)) AS xd,
             CAST(value AS DECIMAL(12,6)) AS yd
      FROM events
    ),
    agg AS (
      SELECT event_type, COUNT(*) AS n_obs,
             SUM(xd) AS sx, SUM(yd) AS sy,
             SUM(xd * yd) AS sxy, SUM(xd * xd) AS sxx
      FROM pts GROUP BY 1
    ),
    fitted AS (
      SELECT event_type, n_obs,
             CASE WHEN n_obs >= 2
                   AND (CAST(n_obs AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) <> 0.0
                  THEN (CAST(n_obs AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / (CAST(n_obs AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             END AS slope,
             CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
      FROM agg
    )
    SELECT event_type, CAST(n_obs AS BIGINT) AS n_obs, slope,
           CASE WHEN slope IS NOT NULL
                THEN (syd - slope * sxd) / CAST(n_obs AS DOUBLE)
           END AS intercept
    FROM fitted
    """,
)
def events_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS fit of value against the day index — drift
    detection as one partial-aggregated groupBy (five exact decimal
    sums per group cross the shuffle, never the points)."""
    ev = _events(spark, sf_dir).select(
        "event_type",
        F.datediff(
            F.to_date("ts"), F.lit("1970-01-01").cast("date")
        ).alias("x_day"),
        "value",
    )
    return timeseries.groupwise_linear_trend(
        ev, ["event_type"], "x_day", "value", x_scale=0, y_scale=6
    )


# ---------------------------------------------------------------------------
# Embedding int8 quantization (SQ8) + quantized search
# ---------------------------------------------------------------------------


@register(
    "emb_quantize_int8",
    """
    WITH dims AS (SELECT CAST(i AS INT) AS i FROM range(1, 9) t(i)),
    vals AS (
      SELECT vec_id, d.i, CAST(embedding[d.i] AS DOUBLE) AS x
      FROM embeddings, dims d
    ),
    params AS (SELECT i, MIN(x) AS mn, MAX(x) AS mx FROM vals GROUP BY 1)
    SELECT v.vec_id, CAST(v.i - 1 AS BIGINT) AS dim_idx,
           CAST(CASE WHEN mx = mn THEN 0
                ELSE LEAST(255, GREATEST(0,
                     FLOOR(((x - mn) * 255.0) / (mx - mn)))) END
                AS BIGINT) AS code
    FROM vals v JOIN params USING (i)
    """,
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-range scalar quantization codes for the first 8 embedding
    dims (operators/quantize.py), exploded to scalar rows for the
    value check. Params fit in one pass; encoding is pure codegen."""
    embs = _embs(spark, sf_dir).select(
        "vec_id", F.slice("embedding", 1, 8).alias("_v8")
    )
    params = quantize.fit_quantizer(embs, "_v8")
    coded = quantize.quantize(embs, params, vec_col="_v8")
    return coded.select(
        "vec_id", F.posexplode("codes").alias("dim_idx", "code")
    ).select(
        "vec_id",
        F.col("dim_idx").cast("bigint"),
        F.col("code").cast("bigint"),
    )


@register(
    "emb_quantized_topk",
    """
    WITH dims AS (SELECT CAST(i AS INT) AS i FROM range(1, 65) t(i)),
    vals AS (
      SELECT vec_id, d.i, CAST(embedding[d.i] AS DOUBLE) AS x
      FROM embeddings, dims d
    ),
    params AS (SELECT i, MIN(x) AS mn, MAX(x) AS mx FROM vals GROUP BY 1),
    deq AS (
      SELECT vec_id,
             list(CASE WHEN mx = mn THEN mn
                  ELSE mn + ((CAST(CAST(LEAST(255, GREATEST(0,
                         FLOOR(((x - mn) * 255.0) / (mx - mn))))
                         AS INT) AS DOUBLE) + 0.5) * (mx - mn)) / 255.0
                  END ORDER BY i) AS dv
      FROM vals JOIN params USING (i) GROUP BY vec_id
    ),
    q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
          WHERE vec_id = 0)
    SELECT d.vec_id,
           list_dot_product(dv, qv)
           / (sqrt(list_dot_product(dv, dv))
              * sqrt(list_dot_product(qv, qv))) AS cosine_q
    FROM deq d, q
    ORDER BY cosine_q DESC, d.vec_id ASC
    LIMIT 10
    """,
)
def emb_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-10 over the int8-quantized corpus — the 4×-narrower
    scan path, value-checked end to end (quantize → dequantize →
    rank) against DuckDB's exact replay of the same arithmetic."""
    embs = _embs(spark, sf_dir)
    params = quantize.fit_quantizer(embs)
    coded = quantize.quantize(embs, params).select("vec_id", "codes")
    return quantize.quantized_topk(
        coded, params, _query_vec(spark, sf_dir), k=10
    )


# ---------------------------------------------------------------------------
# Batch BM25 (many queries, one plan)
# ---------------------------------------------------------------------------

_BM25_BATCH = [
    (1, ["spark", "join", "window"]),
    (2, ["table", "scan"]),
    (3, ["customer", "data", "order"]),
]


def _bm25_batch_oracle() -> str:
    values = ", ".join(
        f"({qid}, '{t}')" for qid, ts in _BM25_BATCH for t in ts
    )
    k1p1 = repr(_BM25_K1 + 1.0)
    k1 = repr(_BM25_K1)
    one_minus_b = repr(1.0 - _BM25_B)
    b = repr(_BM25_B)
    scale = repr(float(retrieval.FP_SCALE))
    return f"""
    WITH queries(query_id, term) AS (VALUES {values}),
    toks AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+') END AS w
      FROM documents
    ),
    docs AS (SELECT doc_id, len(w) AS dl, w FROM toks),
    stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM docs),
    posts AS (
      SELECT doc_id, dl, t.term, COUNT(*) AS tf
      FROM docs, unnest(w) AS t(term)
      WHERE t.term IN (SELECT DISTINCT term FROM queries)
      GROUP BY 1, 2, 3
    ),
    dfs AS (SELECT term, COUNT(*) AS df FROM posts GROUP BY 1),
    term_fp AS (
      SELECT p.term, p.doc_id,
        CAST(FLOOR(
          (((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
            / (CAST(df AS DOUBLE) + 0.5))
           * ((CAST(tf AS DOUBLE) * {k1p1})
              / (CAST(tf AS DOUBLE)
                 + {k1} * ({one_minus_b}
                           + {b} * CAST(dl AS DOUBLE)
                             / (CAST(sum_dl AS DOUBLE)
                                / CAST(n_docs AS DOUBLE))))))
          * {scale}) AS BIGINT) AS fp
      FROM posts p JOIN dfs USING (term) CROSS JOIN stats
    ),
    scored AS (
      SELECT CAST(q.query_id AS BIGINT) AS query_id, t.doc_id,
             CAST(SUM(fp) AS BIGINT) AS score_fp
      FROM term_fp t JOIN queries q USING (term)
      GROUP BY 1, 2
    )
    SELECT query_id, doc_id, score_fp,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY score_fp DESC, doc_id
           ) AS BIGINT) AS rank
    FROM scored
    QUALIFY rank <= 5
    """


@register("doc_bm25_batch", _bm25_batch_oracle())
def doc_bm25_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query BM25 top-5 for a 3-query batch in ONE plan
    (retrieval.bm25_topk_batch): shared term scoring, broadcast query
    set, WindowGroupLimit per-query ranking."""
    qdf = spark.createDataFrame(
        _BM25_BATCH, "query_id long, terms array<string>"
    )
    return retrieval.bm25_topk_batch(
        _docs(spark, sf_dir), qdf, k=5, k1=_BM25_K1, b=_BM25_B
    )


# ---------------------------------------------------------------------------
# Bigram LM fluency (self-trained quality filter)
# ---------------------------------------------------------------------------


def _lm_oracle() -> str:
    scale = repr(float(textops.LM_FP_SCALE))
    return f"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+') END AS w
      FROM documents
    ),
    uni AS (
      SELECT t.w1, COUNT(*) AS cu
      FROM (SELECT unnest(w) AS w1 FROM toks) t GROUP BY 1
    ),
    vstats AS (SELECT COUNT(*) AS v FROM uni),
    docbi AS (
      SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(w)),
                      i -> struct_pack(w1 := w[i], w2 := w[i+1]))) AS bg
        FROM toks
      )
    ),
    bic AS (SELECT w1, w2, COUNT(*) AS cb FROM docbi GROUP BY 1, 2),
    pos AS (
      SELECT d.doc_id,
             CAST(FLOOR(((CAST(cb AS DOUBLE) + 1.0)
                  / (CAST(cu AS DOUBLE) + CAST(v AS DOUBLE)))
                  * {scale}) AS BIGINT) AS p_fp
      FROM docbi d
      JOIN bic USING (w1, w2)
      JOIN uni USING (w1)
      CROSS JOIN vstats
    ),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(p_fp) AS BIGINT) AS sum_fp
      FROM pos GROUP BY 1
    )
    SELECT t.doc_id,
           COALESCE(n_bigrams, 0) AS n_bigrams,
           (CAST(sum_fp AS DOUBLE) / CAST(n_bigrams AS DOUBLE))
             / {scale} AS lm_score
    FROM toks t LEFT JOIN agg USING (doc_id)
    """


@register("doc_lm_fluency", _lm_oracle())
def doc_lm_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-self-trained bigram-LM fluency score per document
    (textops.lm_fluency) — the KenLM-style quality-filter signal as
    one O(corpus tokens) plan with fixed-point order-free sums."""
    return textops.lm_fluency(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# Product quantization: ADC search (sample codebook = value-checked;
# k-means codebook = rows-only with a recall pytest)
# ---------------------------------------------------------------------------

_PQ_M = 8
_PQ_DS = 64 // _PQ_M
_PQ_CODES = 16


def _pq_oracle() -> str:
    scale = repr(float(quantize.PQ_FP_SCALE))
    return f"""
    WITH subs AS (
      SELECT vec_id, CAST(j AS INT) AS sub_idx,
             list_transform(
               list_slice(embedding, j * {_PQ_DS} + 1,
                          j * {_PQ_DS} + {_PQ_DS}),
               x -> CAST(x AS DOUBLE)) AS sv
      FROM embeddings, unnest(range(0, {_PQ_M})) t(j)
    ),
    seed AS (
      SELECT vec_id,
             CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS code
      FROM embeddings ORDER BY vec_id LIMIT {_PQ_CODES}
    ),
    cb AS (
      SELECT s.sub_idx, seed.code, s.sv AS cent
      FROM subs s JOIN seed USING (vec_id)
    ),
    assign AS (
      SELECT s.vec_id, s.sub_idx, c.code,
             CAST(list_sum(list_transform(range(1, {_PQ_DS} + 1),
               i -> CAST(FLOOR((s.sv[i] - c.cent[i]) * (s.sv[i] - c.cent[i])
                               * {scale}) AS BIGINT))) AS BIGINT) AS dist_fp
      FROM subs s JOIN cb c USING (sub_idx)
    ),
    best AS (
      SELECT vec_id, sub_idx, code FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub_idx
                                     ORDER BY dist_fp, code) AS rn
        FROM assign
      ) WHERE rn = 1
    ),
    q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
          FROM embeddings WHERE vec_id = 0),
    adc AS (
      SELECT c.sub_idx, c.code,
             CAST(FLOOR(list_dot_product(c.cent,
               list_slice(qv, c.sub_idx * {_PQ_DS} + 1,
                          c.sub_idx * {_PQ_DS} + {_PQ_DS}))
               * {scale}) AS BIGINT) AS ip_fp
      FROM cb c, q
    ),
    norms AS (
      SELECT vec_id,
             sqrt(list_dot_product(
               list_transform(embedding, x -> CAST(x AS DOUBLE)),
               list_transform(embedding, x -> CAST(x AS DOUBLE))))
               AS vec_norm
      FROM embeddings
    ),
    qn AS (SELECT sqrt(list_dot_product(qv, qv)) AS qnorm FROM q),
    scores AS (
      SELECT b.vec_id, CAST(SUM(ip_fp) AS BIGINT) AS score_fp
      FROM best b JOIN adc USING (sub_idx, code)
      GROUP BY 1
    )
    SELECT s.vec_id,
           (CAST(score_fp AS DOUBLE) / {scale})
             / (n.vec_norm * qn.qnorm) AS cosine_pq
    FROM scores s JOIN norms n USING (vec_id) CROSS JOIN qn
    ORDER BY cosine_pq DESC, s.vec_id ASC
    LIMIT 10
    """


@register("emb_pq_topk", _pq_oracle())
def emb_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized cosine top-10 with the deterministic sample
    codebook (operators/quantize.py pq_encode + pq_adc_topk): encode
    is one sub_idx equi-join with fixed-point argmin, search is an
    m-lookup broadcast join over the m-byte codes — VALUE-checked
    against DuckDB replaying the identical fixed-point arithmetic."""
    embs = _embs(spark, sf_dir)
    cb = quantize.sample_pq_codebook(
        embs, m=_PQ_M, n_codes=_PQ_CODES
    )
    enc = quantize.pq_encode(embs, cb, m=_PQ_M)
    return quantize.pq_adc_topk(
        enc, cb, _query_vec(spark, sf_dir), k=10, m=_PQ_M
    )


@register("emb_pq_kmeans_topk", None)
def emb_pq_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ top-10 with a Lloyd-iterated codebook (m=16 4-dim subspaces,
    64 codes, 2 rounds) — the production-accuracy configuration;
    rows-only (iterative k-means isn't SQL-expressible), recall vs the
    exact top-k pinned by pytest."""
    embs = _embs(spark, sf_dir)
    cb = quantize.fit_pq_codebook(embs, m=16, n_codes=64, iters=2)
    enc = quantize.pq_encode(embs, cb, m=16)
    return quantize.pq_adc_topk(
        enc, cb, _query_vec(spark, sf_dir), k=10, m=16
    )


@register("emb_ivfpq_topk", None)
def emb_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ top-10: coarse k-means cells prune the corpus to
    nprobe/n_cells, PQ ADC scores the survivors' m-byte codes
    (operators/quantize.py ivfpq_topk) — rows-only (two iterative
    fits); recall and the nprobe=n_cells==plain-PQ identity are
    pinned by pytest."""
    from .operators import similarity

    embs = _embs(spark, sf_dir)
    assigned, centroids = similarity.build_ivf_index(embs, n_cells=8)
    cb = quantize.fit_pq_codebook(embs, m=16, n_codes=64, iters=2)
    enc = quantize.pq_encode(embs, cb, m=16).join(
        assigned.select("vec_id", "_cell"), "vec_id"
    )
    return quantize.ivfpq_topk(
        enc, centroids, cb, _query_vec(spark, sf_dir),
        k=10, nprobe=4, m=16,
    )


@register(
    "emb_quality_report",
    """
    WITH tagged AS (
      SELECT vec_id,
             CASE
               WHEN embedding IS NULL OR len(embedding) <> 64
                 THEN 'wrong_dim'
               WHEN len(list_filter(embedding, x -> x IS NULL)) > 0
                 THEN 'has_null'
               WHEN len(list_filter(embedding,
                        x -> isnan(CAST(x AS DOUBLE))
                             OR abs(CAST(x AS DOUBLE)) = 'inf'::DOUBLE))
                    > 0
                 THEN 'non_finite'
               WHEN list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) = 0.0
                 THEN 'zero_norm'
               ELSE ''
             END AS issue
      FROM embeddings
    )
    SELECT issue, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(vec_id) AS BIGINT) AS first_vec_id
    FROM tagged GROUP BY 1
    """,
)
def emb_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding validation gate report: rows per issue class
    (wrong_dim / has_null / non_finite / zero_norm / '' = clean) with
    the first offending id — the pre-index schema gate
    (operators/quantize.py validate_embeddings); one codegen pass +
    one hash-agg, value-checked."""
    tagged = _embs(spark, sf_dir).withColumn(
        "issue", quantize.embedding_issues("embedding", 64)
    )
    return tagged.groupBy("issue").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("vec_id").alias("first_vec_id"),
    )


# ---------------------------------------------------------------------------
# PII scrubbing (round 7): planted-PII differential
# ---------------------------------------------------------------------------

_PII_EMAIL = textops.PII_EMAIL_RE
_PII_IPV4 = textops.PII_IPV4_RE
_PII_PHONE = textops.PII_PHONE_RE


@register(
    "doc_pii_scrub",
    f"""
    WITH planted AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com from 10.'
                  || CAST(doc_id % 256 AS VARCHAR) || '.0.1 call 555-'
                  || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               AS ptext
      FROM documents
    ), staged AS (
      SELECT doc_id, ptext,
             regexp_replace(ptext, '{_PII_EMAIL}', '<EMAIL>', 'g') AS s1
      FROM planted
    ), staged2 AS (
      SELECT doc_id, ptext, s1,
             regexp_replace(s1, '{_PII_IPV4}', '<IP>', 'g') AS s2
      FROM staged
    )
    SELECT doc_id,
           regexp_replace(s2, '{_PII_PHONE}', '<PHONE>', 'g') AS clean_text,
           CAST(len(regexp_extract_all(ptext, '{_PII_EMAIL}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(s1, '{_PII_IPV4}')) AS BIGINT)
             AS n_ips,
           CAST(len(regexp_extract_all(s2, '{_PII_PHONE}')) AS BIGINT)
             AS n_phones
    FROM staged2
    """,
)
def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (operators/textops.py scrub_pii): emails, IPv4s,
    and phone numbers replaced with typed tags in one codegen pass.

    The synthetic corpus contains no PII-shaped strings, so a scrub of
    the raw text would verify nothing — instead the query PLANTS one
    deterministic email, IP, and phone per document (derived from
    doc_id, identically in the Spark plan and the DuckDB oracle) and
    the differential then proves the scrubber found and removed every
    planted instance: clean_text is value-checked byte-for-byte and
    each per-category count must come back exactly 1. Both regex
    engines (Java / RE2) agree on the pattern subset used
    (textops._PII_ORDER documents the contract)."""
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0.1 call 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    docs = _docs(spark, sf_dir).select("doc_id", planted.alias("ptext"))
    n_emails, n_ips, n_phones = textops.pii_counts("ptext")
    return docs.select(
        "doc_id",
        textops.scrub_pii("ptext").alias("clean_text"),
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_phones.alias("n_phones"),
    )


# ---------------------------------------------------------------------------
# k-NN majority-vote classification (round 7)
# ---------------------------------------------------------------------------


@register(
    "emb_knn_classify",
    """
    WITH q AS (
      SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings
      WHERE vec_id % 101 = 0 AND vec_id < 50500
    ), scored AS (
      SELECT q.qid, e.vec_id, e.label,
             list_dot_product(e.embedding::DOUBLE[], q.qv)
             / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                      e.embedding::DOUBLE[]))
                * sqrt(list_dot_product(q.qv, q.qv))) AS cos
      FROM embeddings e, q WHERE e.vec_id <> q.qid
    ), ranked AS (
      SELECT qid, label,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cos DESC, vec_id ASC) AS rnk
      FROM scored
    ), votes AS (
      SELECT qid, label, COUNT(*) AS n_votes
      FROM ranked WHERE rnk <= 5 GROUP BY qid, label
    ), win AS (
      SELECT qid AS query_id, label AS pred_label, n_votes,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY n_votes DESC, label ASC) AS vr
      FROM votes
    )
    SELECT query_id, pred_label, CAST(n_votes AS BIGINT) AS n_votes
    FROM win WHERE vr = 1
    """,
)
def emb_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5-NN majority-vote labels for a bounded query batch
    (operators/similarity.py knn_classify): broadcast queries, one
    corpus scan, WindowGroupLimit top-k, (query,label) vote agg,
    argmax window. Both engines fold the 64-dim products in index
    order, so the exact-cosine ranking is bit-identical and the
    prediction is value-checkable; at corpus scale the scan swaps for
    the IVF probed-cell join with the identical vote stage."""
    embs = _embs(spark, sf_dir)
    queries = embs.where(
        (F.col("vec_id") % 101 == 0) & (F.col("vec_id") < 500 * 101)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    from .operators import similarity

    return similarity.knn_classify(embs, queries, k=5)


# ---------------------------------------------------------------------------
# Positional phrase search (round 7): index algorithm vs scan oracle
# ---------------------------------------------------------------------------


@register(
    "doc_phrase_search",
    r"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN trim(coalesce(text, '')) = '' THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+') END AS w
      FROM documents
    ), hits AS (
      SELECT doc_id,
             list_filter(range(1, len(w)),
                         i -> w[i] = 'hash' AND w[i + 1] = 'join') AS pos
      FROM t
    )
    SELECT doc_id,
           CAST(len(pos) AS BIGINT) AS n_occurrences,
           CAST(list_min(pos) - 1 AS BIGINT) AS first_pos
    FROM hits WHERE len(pos) > 0
    """,
)
def doc_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search for "hash join" via positional postings
    (operators/retrieval.py phrase_search). The oracle deliberately
    uses a DIFFERENT algorithm — a direct token-window scan of every
    document — so the value check is two independent methods agreeing
    on occurrences and positions, not one formula transcribed twice.
    The index plan's shuffle volume is the two terms' posting lists;
    the scan touches the whole corpus."""
    return retrieval.phrase_search(
        _docs(spark, sf_dir), ["hash", "join"]
    )


# ---------------------------------------------------------------------------
# Winsorized robust stats (round 7): exact order-statistic clamps
# ---------------------------------------------------------------------------


@register(
    "doc_length_winsorized",
    r"""
    WITH d AS (
      SELECT doc_id, source,
             CAST(CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+'))
             END AS BIGINT) AS n_tokens
      FROM documents
    ), r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                   ORDER BY n_tokens, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n_s
      FROM d
    ), cuts AS (
      SELECT source,
             MAX(CASE WHEN rn = (n_s + 9) // 10 THEN n_tokens END) AS p10,
             MAX(CASE WHEN rn = (9 * n_s + 9) // 10 THEN n_tokens END) AS p90
      FROM r GROUP BY source
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(c.p10 AS BIGINT) AS p10,
           CAST(c.p90 AS BIGINT) AS p90,
           CAST(SUM(LEAST(GREATEST(d.n_tokens, c.p10), c.p90)) AS DOUBLE)
             / COUNT(*) AS winsorized_mean
    FROM d JOIN cuts c ON d.source = c.source
    GROUP BY d.source, c.p10, c.p90
    """,
)
def doc_length_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source winsorized token-length stats: clamp at the EXACT
    P10/P90 order statistics (rank ceil(q*n) under a deterministic
    (value, id) order — integer DIV formulas, no percentile
    interpolation to disagree over), then a mean whose only float op
    is one exactly-rounded division of exact integers. The robust
    alternative to mean/stddev corpus cards when a source has
    outlier documents.

    Rewritten round 10: the per-source ROW_NUMBER window was ~20
    tasks each carrying 1/20th of the corpus. The cuts now come from
    the bucket-locate operator's INTEGER-rank variant
    (``ranking.group_rank_statistics`` — the oracle's (n+9) div 10
    arithmetic passed through verbatim, where ceil(0.1·n) in floating
    point could disagree at adversarial n), so only ~2/64 of each
    source is ever sorted; the clamp mean is one broadcast join of
    the 20-row cut table + one hash-agg. Oracle hash unchanged."""
    from .operators.ranking import group_rank_statistics

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        F.size(textops.tokens("text")).cast("bigint").alias("n_tokens"),
    ).persist()
    try:
        cuts_long = group_rank_statistics(
            docs,
            "n_tokens",
            {
                "p10": lambda n: (n + 9) // 10,
                "p90": lambda n: (9 * n + 9) // 10,
            },
            ["source"],
            ["doc_id"],
        )
        cuts = cuts_long.groupBy("source").agg(
            F.max(
                F.when(F.col("stat") == "p10", F.col("value"))
            ).alias("p10"),
            F.max(
                F.when(F.col("stat") == "p90", F.col("value"))
            ).alias("p90"),
        )
        clamped = docs.join(F.broadcast(cuts), "source").withColumn(
            "_w",
            F.least(
                F.greatest(F.col("n_tokens"), F.col("p10")), F.col("p90")
            ),
        )
        res = clamped.groupBy("source", "p10", "p90").agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("_w").cast("double") / F.count(F.lit(1))).alias(
                "winsorized_mean"
            ),
        ).select("source", "n_docs", "p10", "p90", "winsorized_mean")
        res = res.persist()
        res.count()
        return res
    finally:
        docs.unpersist()


# ---------------------------------------------------------------------------
# Readability scoring (round 8): exact counts, one-shot float index
# ---------------------------------------------------------------------------


@register(
    "doc_readability",
    r"""
    WITH t AS (
      SELECT doc_id,
             coalesce(text, '') AS txt,
             CASE WHEN trim(coalesce(text, '')) = '' THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+') END AS w
      FROM documents
    ), c AS (
      SELECT doc_id,
             CAST(len(w) AS BIGINT) AS n_words,
             CAST(coalesce(list_sum(list_transform(w, x -> len(x))), 0)
                  AS BIGINT) AS n_chars,
             CAST(len(list_filter(w, x -> len(x) >= 7)) AS BIGINT)
               AS n_long,
             CAST(len(regexp_extract_all(txt, '[.!?]+')) AS BIGINT)
               AS n_sentences
      FROM t
    )
    SELECT doc_id, n_words, n_chars, n_sentences,
           CASE WHEN n_words = 0 THEN NULL
                ELSE CAST(n_long AS DOUBLE) / n_words END AS long_word_ratio,
           CASE WHEN n_words = 0 THEN NULL
                ELSE 4.71::DOUBLE * (CAST(n_chars AS DOUBLE) / n_words)
                     + 0.5::DOUBLE * (CAST(n_words AS DOUBLE)
                                      / GREATEST(n_sentences, 1))
                     - 21.43::DOUBLE END AS ari
    FROM c
    """,
)
def doc_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability profile per document — the curation-side heuristic
    that separates prose from code dumps and keyword stuffing: word /
    character / sentence counts (exact integers), long-word ratio, and
    the Automated Readability Index. All counts are exact integer
    aggregations; the two float outputs are single exactly-rounded
    expressions over exact integers, so the oracle hash-matches
    bit-for-bit. One codegen scan, zero shuffles beyond the implicit
    scan parallelism — at 100 TB this runs at I/O speed."""
    txt = F.coalesce(F.col("text"), F.lit(""))
    toks = textops.tokens("text")
    c = _docs(spark, sf_dir).select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_words"),
        F.aggregate(
            toks, F.lit(0).cast("bigint"), lambda a, w: a + F.length(w)
        ).alias("n_chars"),
        F.size(F.filter(toks, lambda w: F.length(w) >= 7))
        .cast("bigint")
        .alias("n_long"),
        F.size(F.regexp_extract_all(txt, F.lit(r"[.!?]+"), F.lit(0)))
        .cast("bigint")
        .alias("n_sentences"),
    )
    n_words_d = F.col("n_words").cast("double")
    return c.select(
        "doc_id",
        "n_words",
        "n_chars",
        "n_sentences",
        F.when(F.col("n_words") == 0, F.lit(None).cast("double"))
        .otherwise(F.col("n_long").cast("double") / F.col("n_words"))
        .alias("long_word_ratio"),
        F.when(F.col("n_words") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.lit(4.71) * (F.col("n_chars").cast("double") / F.col("n_words"))
            + F.lit(0.5)
            * (n_words_d / F.greatest(F.col("n_sentences"), F.lit(1)))
            - F.lit(21.43)
        )
        .alias("ari"),
    )


# ---------------------------------------------------------------------------
# Per-dimension embedding stats (round 8): dead/degenerate dim report
# ---------------------------------------------------------------------------


@register(
    "emb_dim_stats",
    """
    SELECT CAST(r.i AS BIGINT) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN e.embedding[r.i + 1] = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_zero,
           CAST(COUNT(DISTINCT e.embedding[r.i + 1]) AS BIGINT)
             AS n_distinct,
           CAST(MIN(e.embedding[r.i + 1]) AS DOUBLE) AS vmin,
           CAST(MAX(e.embedding[r.i + 1]) AS DOUBLE) AS vmax,
           CAST(SUM(CASE WHEN e.embedding[r.i + 1] = 0 THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS zero_frac
    FROM embeddings e CROSS JOIN range(0, 64) r(i)
    GROUP BY r.i
    """,
)
def emb_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding health report — the index-build
    pre-flight that catches dead dimensions (n_distinct = 1), zeroed
    dimensions (zero_frac = 1), and clipped ranges before they poison
    a quantizer's codebook: every stat is an EXACT value (counts,
    distinct counts, float min/max widened losslessly to double, one
    exactly-rounded division), so the report value-checks against the
    oracle. posexplode fans each vector into (dim, value) rows — a
    64x row expansion of a narrow pair, shuffled once into a 64-group
    hash-agg with map-side partials; at 100 TB per-dim partials come
    from every partition, never a global sort."""
    e = _embs(spark, sf_dir).select(
        "vec_id", F.posexplode("embedding").alias("dim", "x")
    )
    zero = F.sum(F.when(F.col("x") == 0, 1).otherwise(0))
    return (
        e.groupBy(F.col("dim").cast("bigint").alias("dim"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            zero.cast("bigint").alias("n_zero"),
            F.countDistinct("x").alias("n_distinct"),
            F.min("x").cast("double").alias("vmin"),
            F.max("x").cast("double").alias("vmax"),
            (zero.cast("double") / F.count(F.lit(1))).alias("zero_frac"),
        )
    )


@register(
    "emb_batch_drift",
    """
    WITH d AS (
      SELECT vec_id % 2 AS batch, r.i AS dim,
             CAST(FLOOR(CAST(e.embedding[r.i + 1] AS DOUBLE)
                        * 1048576.0) AS BIGINT) AS xq
      FROM embeddings e CROSS JOIN range(0, 64) r(i)
    ),
    per AS (
      SELECT dim, batch, COUNT(*) AS n, SUM(xq) AS s
      FROM d GROUP BY 1, 2
    )
    SELECT CAST(a.dim AS BIGINT) AS dim,
           CAST(a.n AS BIGINT) AS n_a,
           CAST(b.n AS BIGINT) AS n_b,
           CAST(a.s AS DOUBLE) / (CAST(a.n AS DOUBLE) * 1048576.0)
             AS mean_a,
           CAST(b.s AS DOUBLE) / (CAST(b.n AS DOUBLE) * 1048576.0)
             AS mean_b,
           ABS(CAST(a.s AS DOUBLE) / (CAST(a.n AS DOUBLE) * 1048576.0)
               - CAST(b.s AS DOUBLE) / (CAST(b.n AS DOUBLE) * 1048576.0))
             AS mean_shift
    FROM per a JOIN per b ON a.dim = b.dim
    WHERE a.batch = 0 AND b.batch = 1
    """,
)
def emb_batch_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding DISTRIBUTION DRIFT between two ingestion batches
    (vec_id parity stands in for crawl A vs crawl B): per-dimension
    centroid of each batch and the absolute shift — the screen that
    catches a re-embedded or model-upgraded batch before it poisons a
    shared ANN index (a centroid shift >> typical dim scale means the
    two batches don't live in the same space).

    Determinism (the calibration fixed-point discipline): each
    component is floor-quantized at 2^-20 and summed as int64 —
    order-free, immune to float-summation partitioning — with the
    batch means and their difference computed as identical double
    expressions on both engines. Scale shape: posexplode to (dim,
    batch) pairs, one map-side-combined hash-agg over 128 groups,
    then a 64-row self-join; at 100 TB the only data-sized cost is
    the one pass over the vectors."""
    e = _embs(spark, sf_dir).select(
        (F.col("vec_id") % 2).alias("batch"),
        F.posexplode("embedding").alias("dim", "x"),
    )
    per = e.groupBy("dim", "batch").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.floor(F.col("x").cast("double") * F.lit(1048576.0)).cast(
                "bigint"
            )
        ).alias("s"),
    )
    a = per.where(F.col("batch") == 0).select(
        "dim", F.col("n").alias("n_a"), F.col("s").alias("s_a")
    )
    b = per.where(F.col("batch") == 1).select(
        "dim", F.col("n").alias("n_b"), F.col("s").alias("s_b")
    )
    mean_a = F.col("s_a").cast("double") / (
        F.col("n_a").cast("double") * F.lit(1048576.0)
    )
    mean_b = F.col("s_b").cast("double") / (
        F.col("n_b").cast("double") * F.lit(1048576.0)
    )
    return a.join(b, "dim").select(
        F.col("dim").cast("bigint").alias("dim"),
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        mean_a.alias("mean_a"),
        mean_b.alias("mean_b"),
        F.abs(mean_a - mean_b).alias("mean_shift"),
    )


# ---------------------------------------------------------------------------
# PCA projection (round 8): distributed covariance, driver-side eig
# ---------------------------------------------------------------------------


@register("emb_pca_project", None)
def emb_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection of the embedding corpus to 8 components
    (operators/similarity.py pca_project, MLlib distributed PCA):
    covariance accumulates in one executor pass, the d x d
    eigendecomposition runs on the driver (O(d^3) regardless of
    corpus size), and the projection is a broadcast matrix multiply.
    Rows-only (iterative linear algebra isn't SQL-expressible); the
    numerical contract — explained-variance ratios and subspace
    alignment vs a direct numpy eigendecomposition — is pinned by
    pytest (test_pca_project_matches_numpy)."""
    from .operators import similarity

    out, _ = similarity.pca_project(_embs(spark, sf_dir), k=8)
    return out


# ---------------------------------------------------------------------------
# Compression-ratio quality signal (round 8): Arrow-batched zlib
# ---------------------------------------------------------------------------


@register("doc_compression_ratio", None)
def doc_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document deflate ratio (operators/textops.py
    with_compression_ratio) — the repetition/boilerplate detector the
    MassiveText-style quality gates use: bytes that compress too well
    are log spew and templates, bytes that barely compress are noise.
    Rows-only (zlib isn't SQL-expressible); a direct-zlib
    differential plus determinism-under-repartitioning are pinned by
    pytest. The only Python in the path is the documented
    mapInPandas batch loop over the (id, text) projection."""
    return textops.with_compression_ratio(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# DSIR-style importance scoring (round 8): select toward a target domain
# ---------------------------------------------------------------------------

_DSIR_SCALE = 1 << 20


def _dsir_oracle() -> str:
    scale = repr(float(_DSIR_SCALE))
    return f"""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
      FROM documents
      WHERE trim(text) <> ''
    ),
    corpus AS (SELECT w, COUNT(*)::BIGINT AS cc FROM toks GROUP BY w),
    target AS (
      SELECT w, COUNT(*)::BIGINT AS ct FROM toks
      WHERE lang = 'en' GROUP BY w
    ),
    stats AS (
      SELECT (SELECT COUNT(*) FROM corpus)::BIGINT AS v,
             (SELECT COUNT(*) FROM toks)::BIGINT AS nc,
             (SELECT COUNT(*) FROM toks WHERE lang = 'en')::BIGINT AS nt
    ),
    ratios AS (
      SELECT c.w,
             CAST(FLOOR(
               ((COALESCE(t.ct, 0) + 1.0) * (s.nc + s.v))
               / ((s.nt + s.v) * (c.cc + 1.0)) * {scale}
             ) AS BIGINT) AS r_fp
      FROM corpus c LEFT JOIN target t USING (w) CROSS JOIN stats s
    ),
    per_doc AS (
      SELECT tk.doc_id, COUNT(*)::BIGINT AS n_tokens,
             SUM(r.r_fp)::BIGINT AS sum_fp
      FROM toks tk JOIN ratios r USING (w)
      GROUP BY tk.doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.n_tokens, 0) AS n_tokens,
           (CAST(p.sum_fp AS DOUBLE) / CAST(p.n_tokens AS DOUBLE))
             / {scale} AS importance,
           COALESCE((CAST(p.sum_fp AS DOUBLE)
                     / CAST(p.n_tokens AS DOUBLE)) / {scale} >= 1.0,
                    FALSE) AS keep
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """


@register("doc_dsir_importance", _dsir_oracle())
def doc_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    document by its mean unigram likelihood RATIO between a target
    domain (here the English slice, the pipeline's in-domain proxy)
    and the whole corpus, then keep documents that look more
    target-like than average — the cheap-feature importance weighting
    that recipe runs before expensive training.

    Determinism engineering (the repo's fixed-point rule): each
    token's add-one-smoothed ratio ((ct+1)(nc+V)) / ((nt+V)(cc+1)) is
    one correctly-rounded IEEE expression over exact integer counts,
    quantized to floor(r * 2^20) BEFORE the per-doc sum — the
    aggregate is an order-free integer sum, and the final score is a
    single exact division. Summing raw doubles would drift across
    engines; summing logs would also hit libm differences.

    Scale shape: token explode -> two hash-aggs (corpus + target
    vocab) -> vocab-sized ratio table -> one equi-join back to the
    token stream -> per-doc hash-agg. The ratio table is vocab-sized
    (Heaps'-law-sublinear), the join key is the token, nothing is
    quadratic; at 100 TB the vocab side is still small enough for
    AQE to broadcast."""
    from .operators.textops import tokens

    docs = _docs(spark, sf_dir)
    toks = docs.where(F.trim(F.col("text")) != "").select(
        "doc_id", "lang", F.explode(tokens("text")).alias("w")
    )
    corpus = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cc"))
    target = (
        toks.where(F.col("lang") == "en")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    stats = toks.agg(
        F.count(F.lit(1)).alias("nc"),
        F.sum(
            F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0))
        ).alias("nt"),
        F.count_distinct("w").alias("v"),
    )
    ratios = (
        corpus.join(target, "w", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "w",
            F.floor(
                (
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0))
                    * (F.col("nc") + F.col("v"))
                )
                / (
                    (F.col("nt") + F.col("v"))
                    * (F.col("cc") + F.lit(1.0))
                )
                * F.lit(float(_DSIR_SCALE))
            )
            .cast("long")
            .alias("r_fp"),
        )
    )
    per_doc = (
        toks.join(ratios, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("r_fp").alias("sum_fp"),
        )
    )
    imp = (
        F.col("sum_fp").cast("double") / F.col("n_tokens").cast("double")
    ) / F.lit(float(_DSIR_SCALE))
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            imp.alias("importance"),
            F.coalesce(imp >= 1.0, F.lit(False)).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# CCNet perplexity buckets (round 8): per-language head/middle/tail
# ---------------------------------------------------------------------------


def _ccnet_oracle() -> str:
    scale = repr(float(textops.LM_FP_SCALE))
    return f"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+') END AS w
      FROM documents
    ),
    uni AS (
      SELECT t.w1, COUNT(*) AS cu
      FROM (SELECT unnest(w) AS w1 FROM toks) t GROUP BY 1
    ),
    vstats AS (SELECT COUNT(*) AS v FROM uni),
    docbi AS (
      SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(w)),
                      i -> struct_pack(w1 := w[i], w2 := w[i+1]))) AS bg
        FROM toks
      )
    ),
    bic AS (SELECT w1, w2, COUNT(*) AS cb FROM docbi GROUP BY 1, 2),
    pos AS (
      SELECT d.doc_id,
             CAST(FLOOR(((CAST(cb AS DOUBLE) + 1.0)
                  / (CAST(cu AS DOUBLE) + CAST(v AS DOUBLE)))
                  * {scale}) AS BIGINT) AS p_fp
      FROM docbi d
      JOIN bic USING (w1, w2)
      JOIN uni USING (w1)
      CROSS JOIN vstats
    ),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(p_fp) AS BIGINT) AS sum_fp
      FROM pos GROUP BY 1
    ),
    scored AS (
      SELECT d.doc_id, d.lang,
             (CAST(a.sum_fp AS DOUBLE) / CAST(a.n_bigrams AS DOUBLE))
               / {scale} AS lm_score
      FROM documents d JOIN agg a USING (doc_id)
      WHERE a.n_bigrams > 0
    )
    SELECT doc_id, lang, lm_score, bucket_id,
           CASE bucket_id WHEN 1 THEN 'head'
                          WHEN 2 THEN 'middle'
                          ELSE 'tail' END AS bucket
    FROM (
      SELECT doc_id, lang, lm_score,
             NTILE(3) OVER (PARTITION BY lang
                            ORDER BY lm_score DESC, doc_id) AS bucket_id
      FROM scored
    )
    """


@register("doc_ccnet_buckets", _ccnet_oracle())
def doc_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet bucketing step (Wenzek et al. 2020): within each
    LANGUAGE, rank documents by LM fluency and split them into
    head / middle / tail terciles — the standard pretraining move of
    keeping the head, sampling the middle, dropping the tail, applied
    PER LANGUAGE so low-resource languages aren't drowned by the
    dominant one's fluency distribution.

    Composes the corpus-self-trained bigram fluency score
    (textops.lm_fluency — fixed-point-quantized, hash-exact across
    engines, which is what makes the NTILE ordering deterministic
    here; ties broken by doc_id).

    Scale shape: a plain per-language NTILE window puts the dominant
    language's docs through ONE task — and a real web corpus is about
    half one language, so that task is half the corpus. Instead the
    tercile comes from the distributed ordered-prefix operator run
    PARTITIONED BY language (``operators/ranking.py``): global
    fluency-quantile buckets sub-split every language (monotone
    within each — bucket id is a function of the score), in-bucket
    ranks run in parallel, and per-(lang, bucket) counts carry
    through one tiny window. The exact per-language position plus
    the closed-form NTILE split reproduce the window bit-for-bit."""
    from .operators.ranking import ntile_expr, with_ordered_prefix

    fl = textops.lm_fluency(_docs(spark, sf_dir))
    # persisted: the ordered-prefix pass reads this frame on both the
    # main and the carry side — without the cache the whole bigram
    # fluency machinery runs twice (measured 3.6 s -> ~2 s at sf0.1)
    scored = (
        _docs(spark, sf_dir)
        .select("doc_id", "lang")
        .join(fl.where(F.col("n_bigrams") > 0), "doc_id")
    ).persist()
    try:
        ranked = with_ordered_prefix(
            scored.withColumn("_neg", -F.col("lm_score")),
            "_neg",
            [F.col("_neg"), F.col("doc_id").asc()],
            {"_pos": F.lit(1)},
            partition_cols=["lang"],
            totals={"_n": "_pos"},
        )
        res = ranked.select(
            "doc_id",
            "lang",
            "lm_score",
            ntile_expr(F.col("_pos"), F.col("_n"), 3)
            .cast("long")
            .alias("bucket_id"),
        ).withColumn(
            "bucket",
            F.when(F.col("bucket_id") == 1, "head")
            .when(F.col("bucket_id") == 2, "middle")
            .otherwise("tail"),
        )
        # Materialize the terciles into their own cache, then free
        # the scored intermediate deterministically (ADVICE r9: the
        # bare persist leaked until LRU across a full bench session).
        res = res.persist()
        res.count()
        return res
    finally:
        scored.unpersist()


# ---------------------------------------------------------------------------
# Hybrid retrieval (round 9): reciprocal-rank fusion of BM25 + dense ANN
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_CAND = 50


def _hybrid_rrf_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    k1p1 = repr(_BM25_K1 + 1.0)
    k1 = repr(_BM25_K1)
    one_minus_b = repr(1.0 - _BM25_B)
    b = repr(_BM25_B)
    scale = repr(float(retrieval.FP_SCALE))
    return f"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+') END AS w
      FROM documents
    ),
    docs AS (SELECT doc_id, len(w) AS dl, w FROM toks),
    stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM docs),
    posts AS (
      SELECT doc_id, dl, t.term, COUNT(*) AS tf
      FROM docs, unnest(w) AS t(term)
      WHERE t.term IN ({terms})
      GROUP BY 1, 2, 3
    ),
    dfs AS (SELECT term, COUNT(*) AS df FROM posts GROUP BY 1),
    bm_scored AS (
      SELECT p.doc_id,
        CAST(SUM(CAST(FLOOR(
          (((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
            / (CAST(df AS DOUBLE) + 0.5))
           * ((CAST(tf AS DOUBLE) * {k1p1})
              / (CAST(tf AS DOUBLE)
                 + {k1} * ({one_minus_b}
                           + {b} * CAST(dl AS DOUBLE)
                             / (CAST(sum_dl AS DOUBLE)
                                / CAST(n_docs AS DOUBLE))))))
          * {scale}) AS BIGINT)) AS BIGINT) AS score_fp
      FROM posts p JOIN dfs USING (term) CROSS JOIN stats
      GROUP BY 1
    ),
    bm AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY score_fp DESC, doc_id)
                  AS BIGINT) AS bm_rank
      FROM bm_scored ORDER BY score_fp DESC, doc_id LIMIT {_RRF_CAND}
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    cos_scored AS (
      SELECT e.vec_id,
             list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[])
             / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                      e.embedding::DOUBLE[]))
                * sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])))
               AS cosine
      FROM embeddings e, q
    ),
    cos AS (
      SELECT vec_id,
             CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id)
                  AS BIGINT) AS cos_rank
      FROM cos_scored ORDER BY cosine DESC, vec_id LIMIT {_RRF_CAND}
    ),
    fused AS (
      SELECT COALESCE(b.doc_id, c.vec_id) AS id,
             CAST(COALESCE(b.bm_rank, 0) AS BIGINT) AS bm25_rank,
             CAST(COALESCE(c.cos_rank, 0) AS BIGINT) AS cos_rank,
             COALESCE(CAST(1 AS DOUBLE)
                      / (CAST({_RRF_K} AS DOUBLE)
                         + CAST(b.bm_rank AS DOUBLE)), CAST(0 AS DOUBLE))
             + COALESCE(CAST(1 AS DOUBLE)
                        / (CAST({_RRF_K} AS DOUBLE)
                           + CAST(c.cos_rank AS DOUBLE)),
                        CAST(0 AS DOUBLE)) AS rrf
      FROM bm b FULL OUTER JOIN cos c ON b.doc_id = c.vec_id
    )
    SELECT id, bm25_rank, cos_rank, rrf
    FROM fused ORDER BY rrf DESC, id LIMIT 10
    """


@register("doc_hybrid_rrf_search", _hybrid_rrf_oracle())
def doc_hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (Cormack et al.
    2009): the sparse BM25 top-50 and the dense cosine top-50 for the
    SAME information need fuse as rrf = Σ 1/(60 + rank), taking the
    best of keyword precision and semantic recall — the standard
    first-stage retriever of a modern RAG / hard-negative pipeline.

    Scale shape: both candidate lists come from distributed top-k
    (TakeOrderedAndProject — per-partition heaps, never a global
    sort); the fusion is a full-outer join of two 50-row frames and
    the only windows rank those bounded lists. Absent ranks
    contribute 0 (and surface as rank 0) — the conventional RRF
    treatment. Hash-exact: ranks are integers, the fusion is two
    IEEE divisions and one add, written identically on both engines."""
    bm = retrieval.bm25_topk(
        _docs(spark, sf_dir),
        _BM25_TERMS,
        k=_RRF_CAND,
        k1=_BM25_K1,
        b=_BM25_B,
    ).select(
        F.col("doc_id").alias("id"),
        F.col("rank").cast("bigint").alias("bm_rank"),
    )
    cos50 = similarity.brute_force_topk(
        _embs(spark, sf_dir), _query_vec(spark, sf_dir), k=_RRF_CAND
    )
    w50 = Window.orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    cos = cos50.select(
        F.col("vec_id").alias("id"),
        F.row_number().over(w50).cast("bigint").alias("cos_rank"),
    )
    part = lambda r: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(float(_RRF_K)) + F.col(r).cast("double")),
        F.lit(0.0),
    )
    fused = bm.join(cos, "id", "full_outer").select(
        "id",
        F.coalesce(F.col("bm_rank"), F.lit(0))
        .cast("bigint")
        .alias("bm25_rank"),
        F.coalesce(F.col("cos_rank"), F.lit(0))
        .cast("bigint")
        .alias("cos_rank"),
        (part("bm_rank") + part("cos_rank")).alias("rrf"),
    )
    return fused.orderBy(F.col("rrf").desc(), F.col("id").asc()).limit(10)


# ---------------------------------------------------------------------------
# Entity resolution (round 11): fuzzy pairs -> components -> golden records
# ---------------------------------------------------------------------------


@register(
    "customer_entity_resolution",
    """
    WITH RECURSIVE pairs AS (
      SELECT a.c_custkey AS src, b.c_custkey AS dst
      FROM customer a, customer b
      WHERE a.c_custkey <> b.c_custkey
        AND a.c_nationkey = b.c_nationkey
        AND levenshtein(a.c_name, b.c_name) <= 1
    ),
    reach(node, comp) AS (
      SELECT c_custkey, c_custkey FROM customer
      UNION
      SELECT p.dst, r.comp FROM reach r JOIN pairs p ON p.src = r.node
    ),
    lab AS (
      SELECT node, MIN(comp) AS cluster_id FROM reach GROUP BY node
    )
    SELECT l.cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           ARG_MIN(c.c_name, c.c_custkey) AS canonical_name,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
             AS total_acctbal,
           CAST(COUNT(DISTINCT c.c_nationkey) AS BIGINT) AS n_nations
    FROM lab l JOIN customer c ON c.c_custkey = l.node
    GROUP BY l.cluster_id
    """,
)
def customer_entity_resolution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """End-to-end entity resolution — the composition a master-data
    pipeline runs: blocked fuzzy matching (``edit_distance_self_join``,
    deletion-neighborhood keys, never a cross join) HARD-BLOCKED on
    nation — the ER discipline: a fuzzy key alone chains sequential
    ids into one giant component, so the match predicate is
    same-nation AND edit-distance ≤ 1 — feeds the iterative
    ``connected_components`` labeler, and each cluster
    collapses to ONE golden record (canonical member = smallest key,
    merged balance, nation spread). Singletons keep a golden record
    of their own — the output is the deduplicated master table.

    The ORACLE is this repo's first WITH RECURSIVE twin: DuckDB
    derives the same clusters by transitive closure over the O(n²)
    Levenshtein pair set — tractable at sf0.01 only, which is the
    point: the Spark side's blocking join + O(edges)-per-round
    labeling is what survives at 100 TB, and the recursive closure
    certifies it on the small slice. Monetary merge accumulates in
    DECIMAL(18,4) (the module-wide order-independence rule);
    canonical_name is MIN_BY on the unique key — deterministic on
    both engines.

    Scale shape: deletion-key blocking with nation folded INTO the
    8-byte hash shuffle key (``block_cols`` — cross-nation candidates
    are never generated, not filtered after the fact),
    star-contraction WCC (O(log n) rounds — this graph's diameter is
    50 at sf0.1, which broke the old label-propagation loop),
    one cluster-keyed hash-agg for the golden records. No window, no
    driver-side graph."""
    from .operators.graph import connected_components

    cust = read_table_dir(spark, sf_dir, "customer")
    # nation folds into the deletion-join's blocking key (r11 verdict
    # item 2): cross-nation near-identical names are never generated,
    # shuffled, or verified — blocking happens where blocking belongs,
    # in the key, not as a post-hoc filter over the pair set.
    pairs = linkage.edit_distance_self_join(
        cust,
        "c_custkey",
        "c_name",
        max_distance=1,
        block_cols=["c_nationkey"],
    )
    comps = connected_components(
        cust.select(F.col("c_custkey").alias("node")),
        pairs.select(
            F.col("left_id").alias("src"),
            F.col("right_id").alias("dst"),
        ),
    )
    return (
        comps.join(cust, comps["node"] == cust["c_custkey"])
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.min_by("c_name", "c_custkey").alias("canonical_name"),
            F.sum(F.col("c_acctbal").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_acctbal"),
            F.count_distinct("c_nationkey")
            .cast("bigint")
            .alias("n_nations"),
        )
        .select(
            F.col("component").alias("cluster_id"),
            "n_members",
            "canonical_name",
            "total_acctbal",
            "n_nations",
        )
    )


# ---------------------------------------------------------------------------
# MMR diversified re-ranking (round 13)
# ---------------------------------------------------------------------------

_MMR_SHORTLIST = 20
_MMR_K = 8
_MMR_FP = 1 << 30
# λ = 0.7 as the integer pair (7, 3): score = 7·rel_fp − 3·max_sim_fp
_MMR_LN, _MMR_LD = 7, 3


def _mmr_oracle() -> str:
    """Unrolled greedy MMR in DuckDB (the doc_bpe_token_ids unroll
    discipline): one CTE per greedy step, each an argmax over the
    shortlist minus prior picks, scored 7·rel − 3·max sim-to-picks in
    int64 fixed point."""
    cos = (
        "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b})))"
    )
    # every CTE is MATERIALIZED: the picks chain references each
    # predecessor several times, and DuckDB's default CTE inlining
    # re-derives the whole upstream tree per reference — exponential
    # in the number of greedy steps (measured: the un-hinted form
    # never finishes at 8 steps)
    parts = [
        "WITH e AS MATERIALIZED (SELECT vec_id,"
        " embedding::DOUBLE[] AS v FROM embeddings)",
        "q AS MATERIALIZED (SELECT v AS qv FROM e WHERE vec_id = 0)",
        "rel AS MATERIALIZED (SELECT e.vec_id, e.v, CAST(FLOOR("
        + cos.format(a="e.v", b="q.qv")
        + f" * {float(_MMR_FP)!r}) AS BIGINT) AS rel_fp"
        " FROM e, q WHERE e.vec_id <> 0)",
        f"short AS MATERIALIZED (SELECT vec_id, v, rel_fp FROM rel"
        f" ORDER BY rel_fp DESC, vec_id LIMIT {_MMR_SHORTLIST})",
        "sims AS MATERIALIZED (SELECT a.vec_id AS ia, b.vec_id AS ib,"
        " CAST(FLOOR("
        + cos.format(a="a.v", b="b.v")
        + f" * {float(_MMR_FP)!r}) AS BIGINT) AS sim_fp"
        " FROM short a JOIN short b ON a.vec_id <> b.vec_id)",
        "s1 AS MATERIALIZED (SELECT vec_id, rel_fp FROM short"
        " ORDER BY rel_fp DESC, vec_id LIMIT 1)",
        "p1 AS MATERIALIZED (SELECT vec_id FROM s1)",
    ]
    for i in range(2, _MMR_K + 1):
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT c.vec_id, c.rel_fp"
            f" FROM short c"
            f" WHERE c.vec_id NOT IN (SELECT vec_id FROM p{i-1})"
            f" ORDER BY {_MMR_LN} * c.rel_fp - {_MMR_LD} *"
            f" (SELECT MAX(s.sim_fp) FROM sims s"
            f"  JOIN p{i-1} pp ON s.ib = pp.vec_id"
            f"  WHERE s.ia = c.vec_id) DESC, c.vec_id LIMIT 1)"
        )
        parts.append(
            f"p{i} AS MATERIALIZED (SELECT vec_id FROM p{i-1}"
            f" UNION ALL SELECT vec_id FROM s{i})"
        )
    union = "\n    UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS rank, vec_id,"
        f" CAST(rel_fp AS DOUBLE) / {float(_MMR_FP)!r} AS relevance"
        f" FROM s{i}"
        for i in range(1, _MMR_K + 1)
    )
    return ",\n    ".join(parts) + "\n    " + union


@register("emb_mmr_rerank", _mmr_oracle())
def emb_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998) of the cosine shortlist for the standard probe query
    (vec_id 0): greedily pick k=8 of the top-20, each step maximizing
    λ·relevance − (1−λ)·max-similarity-to-already-picked — the
    diversified top-k every retrieval stack bolts onto its ANN
    shortlist so the user doesn't get eight paraphrases of the same
    hit. λ = 0.7 runs as the exact integer score 7·rel_fp −
    3·max_sim_fp over 2^30 fixed-point cosines, ties to the smaller
    id, so the greedy trajectory is engine-exact; the oracle unrolls
    all eight argmax steps as chained CTEs (the BPE-oracle unroll
    discipline).

    Scale shape: relevance is one broadcast-query scan over the
    corpus (the ANN family's job at 100 TB — this operator's input is
    its output); everything past the top-20 shortlist is control
    plane — a 20×20 fixed-point similarity matrix (400 bounded rows,
    the documented bounded-collect class) and an 8-step integer
    greedy. Returns (rank, vec_id, relevance)."""
    embs = _embs(spark, sf_dir)
    qv = _query_vec(spark, sf_dir)
    rel_fp = F.floor(
        similarity.cosine_to_query(F.col("embedding"), qv)
        * F.lit(float(_MMR_FP))
    ).cast("bigint")
    short = (
        embs.where(F.col("vec_id") != 0)
        .select("vec_id", "embedding", rel_fp.alias("rel_fp"))
        .orderBy(F.col("rel_fp").desc(), F.col("vec_id").asc())
        .limit(_MMR_SHORTLIST)
        .persist()
    )
    try:
        a = short.select(
            F.col("vec_id").alias("ia"), F.col("embedding").alias("va")
        )
        b = short.select(
            F.col("vec_id").alias("ib"), F.col("embedding").alias("vb")
        )
        sim_fp = F.floor(
            similarity.pairwise_cosine(F.col("va"), F.col("vb"))
            * F.lit(float(_MMR_FP))
        ).cast("bigint")
        sims = {
            (r["ia"], r["ib"]): r["s"]
            for r in a.crossJoin(F.broadcast(b))
            .where(F.col("ia") != F.col("ib"))
            .select("ia", "ib", sim_fp.alias("s"))
            .collect()
        }
        rels = {
            r["vec_id"]: r["rel_fp"]
            for r in short.select("vec_id", "rel_fp").collect()
        }
        # exact-integer greedy, ties to the smaller id (mirrors the
        # oracle's ORDER BY ... DESC, vec_id)
        picked: list[int] = []
        first = max(rels, key=lambda v: (rels[v], -v))
        picked.append(first)
        while len(picked) < min(_MMR_K, len(rels)):
            best = None
            for c, rc in rels.items():
                if c in picked:
                    continue
                ms = max(sims[(c, s)] for s in picked)
                score = _MMR_LN * rc - _MMR_LD * ms
                key = (score, -c)
                if best is None or key > best[0]:
                    best = (key, c)
            picked.append(best[1])
        rows = [
            (i + 1, int(v), rels[v] / float(_MMR_FP))
            for i, v in enumerate(picked)
        ]
        return spark.createDataFrame(
            rows, "rank bigint, vec_id bigint, relevance double"
        )
    finally:
        short.unpersist()


@register(
    "customer_blocking_quality",
    """
    WITH dels AS (
      SELECT c_custkey,
             unnest(list_distinct(list_prepend(c_name,
               list_transform(range(1, length(c_name) + 1),
                 i -> substr(c_name, 1, i - 1)
                      || substr(c_name, i + 1, length(c_name)))))) AS v
      FROM customer
    ),
    cand AS (
      SELECT DISTINCT a.c_custkey AS ia, b.c_custkey AS ib
      FROM dels a JOIN dels b
        ON b.v = a.v AND b.c_custkey > a.c_custkey
    ),
    tp AS (
      SELECT a.c_custkey AS ia, b.c_custkey AS ib
      FROM customer a, customer b
      WHERE a.c_custkey < b.c_custkey
        AND levenshtein(a.c_name, b.c_name) <= 1
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer),
    stats AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_cand,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM tp) AS n_true,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM cand c
              WHERE EXISTS (SELECT 1 FROM tp
                            WHERE tp.ia = c.ia AND tp.ib = c.ib))
               AS n_hit,
             nn.n AS n_records
      FROM nn
    )
    SELECT n_records, n_true AS n_true_pairs,
           n_cand AS n_candidate_pairs,
           CAST(n_hit AS DOUBLE) / CAST(n_true AS DOUBLE)
             AS pair_completeness,
           1.0 - CAST(n_cand AS DOUBLE)
                 / (CAST(n_records AS DOUBLE)
                    * CAST(n_records - 1 AS DOUBLE) / 2.0)
             AS reduction_ratio
    FROM stats WHERE n_true > 0
    """,
)
def customer_blocking_quality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Blocking-quality metrics for the deletion-neighborhood ER
    blocking (the Christen record-linkage evaluation pair): PAIR
    COMPLETENESS (share of true Levenshtein≤1 pairs that share at
    least one blocking key — the containment theorem says exactly
    1.0, and this query PROVES it cross-engine on real names rather
    than asserting it) and REDUCTION RATIO (share of the n·(n−1)/2
    cross-join pairs the blocking never generates — the number that
    justifies the whole approach at 100 TB). Joins on the variant
    STRING, not the production xxhash64 key, precisely so DuckDB can
    replay the candidate set bit-for-bit; the production operator's
    hash join is a superset-by-collision refinement verified
    downstream.

    Scale shape: deletion-variant explode (≤ length+1 keys/record) +
    one equi-join whose bucket sizes track true name-collision
    density; the ground-truth cross join exists ONLY in the oracle at
    small SF — the Spark side derives true pairs from the verified
    blocking output itself (legitimate because completeness = 1.0 is
    part of what the hash check asserts)."""
    c = read_table_dir(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    # Names ride the blocking join (the edit_distance_self_join
    # discipline — left/right carry their strings), so no join-back
    # against the customer table is ever needed; a pair's name is
    # functionally determined by its key, so dropDuplicates on the
    # pair keys alone is exact.
    dels = c.select(
        "c_custkey",
        "c_name",
        F.explode(linkage.deletion_keys("c_name", 1)).alias("v"),
    ).distinct()
    a = dels.select(
        F.col("v"),
        F.col("c_custkey").alias("ia"),
        F.col("c_name").alias("na"),
    )
    b = dels.select(
        F.col("v"),
        F.col("c_custkey").alias("ib"),
        F.col("c_name").alias("nb"),
    )
    # ONE pass computes both counters (r14 optimization, guide §1.2):
    # candidates = distinct blocked pairs; true pairs = candidates
    # passing exact Levenshtein. The r13 form persisted two frames and
    # ran four actions (n_cand, n_true, a hit semi-join, n_records) —
    # but its "verified" frame was DERIVED from the candidate frame by
    # filtering, so verified ⊆ candidates holds by construction and
    # the hit semi-join was an identity (n_hit == n_true, provably,
    # not just at this SF). Outputs are value-identical; the oracle
    # still recomputes true pairs from the O(n²) cross join, so the
    # hash match continues to PROVE completeness = 1.0 cross-engine
    # rather than assuming it.
    flagged = (
        a.join(b, "v")
        .where(F.col("ib") > F.col("ia"))
        .dropDuplicates(["ia", "ib"])
        .select(
            (F.levenshtein("na", "nb", 1) >= 0).alias("_ok")
        )
    )
    n_records = c.count()
    agg = flagged.agg(
        F.count(F.lit(1)).alias("nc"),
        F.sum(F.col("_ok").cast("long")).alias("nt"),
    ).first()
    n_cand = int(agg["nc"] or 0)
    n_true = int(agg["nt"] or 0)
    total = n_records * (n_records - 1) / 2.0
    rows = [
        (
            n_records,
            n_true,
            n_cand,
            (float(n_true) / float(n_true)) if n_true else None,
            1.0 - float(n_cand) / total,
        )
    ]
    out = spark.createDataFrame(
        rows,
        "n_records bigint, n_true_pairs bigint, "
        "n_candidate_pairs bigint, pair_completeness double, "
        "reduction_ratio double",
    )
    return out.where(F.col("n_true_pairs") > 0)
