"""Warehouse-maintenance workloads: SCD Type-2 dimension versioning and
declarative data-quality expectations — the history-keeping and
validation layers a user of the reference's MERGE + recon-report stack
(``utils.py:222-230``, ``reporting_utils.py:63-89``) graduates to.

Oracle notes: the SCD2 batch is derived deterministically from the
customer table (modulus-selected updates) so DuckDB can replay the
close/reopen/insert classification from the same parquet; timestamps
are literal batch dates; double arithmetic (acctbal + 100) is IEEE-
deterministic on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.quality import expectation_report
from .operators.scd import scd2_apply, scd2_bootstrap
from .registry import register
from .workloads_analytics import _t

_T0 = "1995-01-01 00:00:00"
_T1 = "1998-01-01 00:00:00"


_SCD2_HISTORY_SQL = f"""
    WITH cur AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
             TIMESTAMP '{_T0}' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to,
             TRUE AS is_current
      FROM customer
    ),
    upd AS (
      SELECT c_custkey, c_name, c_nationkey,
             CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100
                  ELSE c_acctbal END AS c_acctbal,
             CASE WHEN c_custkey % 15 = 0 THEN 'MACHINERY'
                  ELSE c_mktsegment END AS c_mktsegment
      FROM customer WHERE c_custkey % 5 = 0
      UNION ALL
      SELECT c_custkey + 1000000,
             'Customer#NEW' || CAST(c_custkey AS VARCHAR),
             c_nationkey, 0.0, 'BUILDING'
      FROM customer WHERE c_custkey % 500 = 0
    ),
    chg AS (
      SELECT u.c_custkey FROM upd u JOIN cur c USING (c_custkey)
      WHERE u.c_name IS DISTINCT FROM c.c_name
         OR u.c_nationkey IS DISTINCT FROM c.c_nationkey
         OR u.c_acctbal IS DISTINCT FROM c.c_acctbal
         OR u.c_mktsegment IS DISTINCT FROM c.c_mktsegment
    )
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           valid_from, valid_to, is_current
    FROM cur WHERE c_custkey NOT IN (SELECT c_custkey FROM chg)
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           valid_from, TIMESTAMP '{_T1}', FALSE
    FROM cur WHERE c_custkey IN (SELECT c_custkey FROM chg)
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           TIMESTAMP '{_T1}', CAST(NULL AS TIMESTAMP), TRUE
    FROM upd WHERE c_custkey IN (SELECT c_custkey FROM chg)
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           TIMESTAMP '{_T1}', CAST(NULL AS TIMESTAMP), TRUE
    FROM upd WHERE c_custkey NOT IN (SELECT c_custkey FROM cur)
"""


@register(
    "scd2_customer_history",
    _SCD2_HISTORY_SQL,
)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 apply over the customer dimension: a deterministic update
    snapshot (balance bump for custkey%10, segment move for custkey%15,
    brand-new keys for custkey%500, no-op rows otherwise) hits the
    bootstrapped history; changed keys close + reopen, fresh keys
    insert, no-ops pass through untouched."""
    c = _t(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    upd = c.where(key % 5 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.when(key % 10 == 0, F.col("c_acctbal") + 100)
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
        F.when(key % 15 == 0, F.lit("MACHINERY"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    fresh = c.where(key % 500 == 0).select(
        (key + 1000000).alias("c_custkey"),
        F.concat(F.lit("Customer#NEW"), key.cast("string")).alias("c_name"),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("BUILDING").alias("c_mktsegment"),
    )
    current = scd2_bootstrap(c, F.lit(_T0).cast("timestamp"))
    return scd2_apply(
        current,
        upd.unionByName(fresh),
        keys=["c_custkey"],
        batch_ts=F.lit(_T1).cast("timestamp"),
    )


_DQ_STATUS = ("F", "O", "P")


@register(
    "dq_orders_report",
    f"""
    SELECT 'o_orderkey_not_null' AS rule,
           COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS violations,
           COUNT(*) FILTER (WHERE o_orderkey IS NULL) = 0 AS passed
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus_in_set',
           COUNT(*) FILTER (WHERE o_orderstatus IS NULL
                            OR o_orderstatus NOT IN {_DQ_STATUS!r}),
           COUNT(*) FILTER (WHERE o_orderstatus IS NULL
                            OR o_orderstatus NOT IN {_DQ_STATUS!r}) = 0
    FROM orders
    UNION ALL
    SELECT 'o_totalprice_positive',
           COUNT(*) FILTER (WHERE o_totalprice IS NULL
                            OR NOT (o_totalprice > 0)),
           COUNT(*) FILTER (WHERE o_totalprice IS NULL
                            OR NOT (o_totalprice > 0)) = 0
    FROM orders
    UNION ALL
    SELECT 'o_orderkey_unique',
           COUNT(*) - COUNT(DISTINCT o_orderkey),
           COUNT(*) - COUNT(DISTINCT o_orderkey) = 0
    FROM orders
    UNION ALL
    SELECT 'o_custkey_references_customer',
           COUNT(*) FILTER (WHERE o_custkey IS NULL
                            OR o_custkey NOT IN
                               (SELECT c_custkey FROM customer)),
           COUNT(*) FILTER (WHERE o_custkey IS NULL
                            OR o_custkey NOT IN
                               (SELECT c_custkey FROM customer)) = 0
    FROM orders
    """,
)
def dq_orders_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectations over orders: not-null, accepted values,
    positivity, key uniqueness, and referential integrity against
    customer — all row-level rules in one scan, the FK check as one
    anti-join."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return expectation_report(
        orders,
        row_rules={
            "o_orderkey_not_null": F.col("o_orderkey").isNull(),
            "o_orderstatus_in_set": F.col("o_orderstatus").isNull()
            | ~F.col("o_orderstatus").isin(*_DQ_STATUS),
            "o_totalprice_positive": F.col("o_totalprice").isNull()
            | ~(F.col("o_totalprice") > 0),
        },
        unique_rules={"o_orderkey_unique": ["o_orderkey"]},
        ref_rules={
            "o_custkey_references_customer": (
                ["o_custkey"],
                customer,
                ["c_custkey"],
            )
        },
    )


@register(
    "recon_snapshot_diff",
    """
    WITH old AS (
      SELECT c_custkey, c_name, c_acctbal
      FROM customer WHERE c_custkey % 10 <> 0
    ),
    new AS (
      SELECT c_custkey, c_name,
             CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 100.0
                  ELSE c_acctbal END AS c_acctbal
      FROM customer WHERE c_custkey % 7 <> 0
    )
    SELECT COALESCE(new.c_custkey, old.c_custkey) AS c_custkey,
           CASE WHEN old.c_custkey IS NULL THEN 'inserted'
                WHEN new.c_custkey IS NULL THEN 'deleted'
                WHEN old.c_name = new.c_name
                     AND old.c_acctbal = new.c_acctbal THEN 'unchanged'
                ELSE 'updated' END AS change_type
    FROM old FULL OUTER JOIN new USING (c_custkey)
    """,
)
def recon_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6 extension: row-level change set between two deterministic
    snapshots of the customer table (modulus-selected deletes, inserts,
    and balance updates) — the derived-CDC recon a lake runs when the
    source emits no changefeed. One full-outer join; null-safe change
    detection (plans/recon.py snapshot_diff)."""
    from .plans.recon import snapshot_diff

    c = _t(spark, sf_dir, "customer")
    old = c.where(F.col("c_custkey") % 10 != 0).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    new = c.where(F.col("c_custkey") % 7 != 0).select(
        "c_custkey",
        "c_name",
        F.when(
            F.col("c_custkey") % 5 == 0, F.col("c_acctbal") + 100.0
        ).otherwise(F.col("c_acctbal")).alias("c_acctbal"),
    )
    return snapshot_diff(old, new, keys=["c_custkey"])


@register(
    "scd2_customer_changes",
    f"""
    WITH hist AS (
    {_SCD2_HISTORY_SQL}
    ),
    versioned AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY c_custkey
                                ORDER BY valid_from) AS vn,
             LEAD(valid_from) OVER (PARTITION BY c_custkey
                                    ORDER BY valid_from) AS next_from
      FROM hist
    )
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           valid_from AS change_ts,
           CASE WHEN vn = 1 THEN 'insert' ELSE 'update' END AS op
    FROM versioned
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           valid_to AS change_ts, 'delete' AS op
    FROM versioned
    WHERE next_from IS NULL AND NOT is_current AND valid_to IS NOT NULL
    """,
)
def scd2_customer_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC feed derived FROM the SCD2 history (operators/scd.py
    scd2_change_feed — the inverse of scd2_apply): first versions as
    inserts, later versions as updates, closed successorless versions
    as deletes. One per-key window over the history, no joins;
    value-checked against a window replay of the same rule."""
    from .operators.scd import scd2_change_feed

    return scd2_change_feed(
        scd2_customer_history(spark, sf_dir), keys=["c_custkey"]
    )


# ---------------------------------------------------------------------------
# Benford first-digit screen (round 8)
# ---------------------------------------------------------------------------

# log10(1 + 1/d) evaluated ONCE in Python and embedded as literals in
# both engines — engine libm log10 is not guaranteed bit-identical.
_BENFORD = {
    "1": 0.3010299956639812,
    "2": 0.17609125905568124,
    "3": 0.12493873660829992,
    "4": 0.09691001300805642,
    "5": 0.07918124604762482,
    "6": 0.06694678963061322,
    "7": 0.05799194697768673,
    "8": 0.05115252244738129,
    "9": 0.04575749056067514,
}


@register(
    "orders_benford_dq",
    f"""
    WITH digits AS (
      SELECT SUBSTRING(CAST(CAST(o_totalprice AS DECIMAL(18,4))
                            AS VARCHAR), 1, 1) AS digit,
             COUNT(*) AS n_rows
      FROM orders WHERE o_totalprice >= 1
      GROUP BY 1
    ),
    shares AS (
      SELECT digit, n_rows,
             CAST(n_rows AS DOUBLE)
               / CAST(SUM(n_rows) OVER () AS DOUBLE) AS obs_share,
             CASE digit
               {' '.join(f"WHEN '{d}' THEN CAST({v!r} AS DOUBLE)"
                         for d, v in _BENFORD.items())}
             END AS exp_share
      FROM digits
    )
    SELECT digit, CAST(n_rows AS BIGINT) AS n_rows, obs_share, exp_share,
           (obs_share - exp_share) * (obs_share - exp_share) / exp_share
             AS chi2_term
    FROM shares
    """,
)
def orders_benford_dq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over order totals
    (operators/quality.py benford_profile) — the fraud/synthetic-data
    check a DQ layer runs beside null/range expectations
    (dq_orders_report). The first digit comes from the DECIMAL string
    rendering, not a log/floor round trip (libm log10 differs across
    engines at boundaries); expected shares are shared Python literal
    doubles. One 9-group map-side-combined aggregate — no sort, and
    the structural 30% skew toward digit 1 is irrelevant at 9 groups.
    TPC-H uniform prices will FAIL the screen (high chi2) — the point
    of the check is the number, not a pass."""
    from .operators.quality import benford_profile

    return benford_profile(
        _t(spark, sf_dir, "orders"), "o_totalprice"
    )


# ---------------------------------------------------------------------------
# k-anonymity audit (round 9): governance check before data sharing
# ---------------------------------------------------------------------------


@register(
    "customer_k_anonymity",
    """
    WITH qi AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS acctbal_band
      FROM customer
    ),
    grp AS (
      SELECT c_nationkey, c_mktsegment, acctbal_band,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM qi GROUP BY 1, 2, 3
    )
    SELECT k,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(k) AS BIGINT) AS n_rows,
           k < 5 AS violates_k5
    FROM grp GROUP BY k
    """,
)
def customer_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the customer quasi-identifier tuple
    (nation, market segment, account-balance band): the privacy
    pre-flight a governance layer runs before a table leaves the
    boundary — every row in a group of size k is re-identifiable to
    1-in-k, so the k<5 rows are what a release must suppress or
    generalize further. The report is the k-histogram (group sizes,
    affected rows, violation flag).

    Plan: one hash-agg over the QI tuple (map-side combined) and one
    over the k value — both bounded well below the table; no sort, no
    window, no join. At 100 TB this is two shuffles of shrinking
    aggregates. The band uses FLOOR of one IEEE division, identical
    on both engines."""
    c = _t(spark, sf_dir, "customer")
    grp = (
        c.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / F.lit(1000.0))
            .cast("bigint")
            .alias("acctbal_band"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "acctbal_band")
        .agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    )
    return grp.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("k").cast("bigint").alias("n_rows"),
    ).select(
        "k", "n_groups", "n_rows", (F.col("k") < 5).alias("violates_k5")
    )


# ---------------------------------------------------------------------------
# Round 10: chi-square independence screen (distribution drift)
# ---------------------------------------------------------------------------

_CHI2_FP = 1073741824.0  # 2^30 — the calibration-curve fixed point


@register(
    "doc_source_lang_chi2",
    f"""
    WITH obs AS (
      SELECT source, lang, COUNT(*) AS o FROM documents GROUP BY 1, 2
    ),
    rt AS (SELECT source, COUNT(*) AS r FROM documents GROUP BY 1),
    ct AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY 1),
    nn AS (SELECT COUNT(*) AS n FROM documents),
    cells AS (
      SELECT rt.source, ct.lang, rt.r, ct.c, nn.n,
             COALESCE(obs.o, 0) AS o
      FROM rt CROSS JOIN ct CROSS JOIN nn
      LEFT JOIN obs ON obs.source = rt.source AND obs.lang = ct.lang
    ),
    terms AS (
      SELECT CAST(FLOOR(
        ((CAST(o AS DOUBLE)
          - CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
         * (CAST(o AS DOUBLE)
            - CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE)))
        / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        * {_CHI2_FP}) AS BIGINT) AS t
      FROM cells
    )
    SELECT CAST(SUM(t) AS DOUBLE) / {_CHI2_FP} AS chi2,
           CAST(((SELECT COUNT(*) FROM rt) - 1)
                * ((SELECT COUNT(*) FROM ct) - 1) AS BIGINT) AS dof,
           (SELECT CAST(n AS BIGINT) FROM nn) AS n_docs
    FROM terms
    """,
)
def doc_source_lang_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between SOURCE and LANGUAGE —
    the categorical drift/contamination screen: a corpus whose
    language mix varies wildly by source (huge chi2 vs the dof) needs
    per-source language reweighting before mixing; an independent mix
    doesn't. The same operator shape screens any pair of bounded
    categorical columns (batch x label, shard x topic).

    Determinism (the calibration-curve discipline): observed/marginal
    counts are exact integers; each cell's (o-e)^2/e term is ONE
    identical double expression on both engines, quantized
    floor(term * 2^30) and summed as int64 — order-free — with a
    single final division, so the float-summation ordering question
    never arises. Zero cells are INCLUDED (each contributes its
    expectation), via the bounded marginal cross join.

    Scale shape: one (source, lang) hash-agg over the corpus (map-side
    combined), then everything else runs on the |sources| x |langs|
    marginal grid — bounded category tables, so the cross join is a
    broadcast of dozens of rows, never data."""
    from .workloads_llm import _docs

    d = _docs(spark, sf_dir).select("source", "lang")
    obs = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("o"))
    rt = d.groupBy("source").agg(F.count(F.lit(1)).alias("r"))
    ct = d.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    nn = d.agg(F.count(F.lit(1)).alias("n"))
    cells = (
        rt.crossJoin(F.broadcast(ct))
        .crossJoin(F.broadcast(nn))
        .join(obs, ["source", "lang"], "left")
        .select(
            "r",
            "c",
            "n",
            F.coalesce("o", F.lit(0)).alias("o"),
        )
    )
    od = F.col("o").cast("double")
    exp = (
        F.col("r").cast("double")
        * F.col("c").cast("double")
        / F.col("n").cast("double")
    )
    term = (od - exp) * (od - exp) / exp
    t = F.floor(term * F.lit(_CHI2_FP)).cast("bigint")
    dof = (
        rt.agg(F.count(F.lit(1)).alias("nr"))
        .crossJoin(ct.agg(F.count(F.lit(1)).alias("nc")))
        .select(
            ((F.col("nr") - 1) * (F.col("nc") - 1))
            .cast("bigint")
            .alias("dof")
        )
    )
    stat = cells.agg(
        (F.sum(t).cast("double") / F.lit(_CHI2_FP)).alias("chi2")
    )
    return (
        stat.crossJoin(F.broadcast(dof))
        .crossJoin(F.broadcast(nn))
        .select("chi2", "dof", F.col("n").cast("bigint").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# l-diversity audit (round 11): k-anonymity's sibling gate
# ---------------------------------------------------------------------------


@register(
    "customer_l_diversity",
    """
    WITH cells AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS band,
             COUNT(*) AS n
      FROM customer GROUP BY 1, 2, 3
    ),
    grp AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS l,
             CAST(SUM(n) AS BIGINT) AS n
      FROM cells GROUP BY 1, 2
    )
    SELECT l,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           l < 3 AS violates_l3
    FROM grp GROUP BY l
    """,
)
def customer_l_diversity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """l-diversity audit — k-anonymity's required sibling: a QI group
    can be large (k-safe) yet still leak if every member shares the
    SAME sensitive value, so the gate also demands ≥l distinct
    sensitive values per group. QI tuple = (nation, market segment),
    sensitive attribute = the account-balance band; the report is the
    l-histogram with the l<3 violation flag, mirroring
    ``customer_k_anonymity``'s k-histogram so a governance layer
    reads both gates off the same shape.

    Plan: distinct-count WITHOUT count_distinct's expand — two
    stacked map-side-combined hash-aggs (QI+band cells → QI groups →
    l histogram), each output strictly smaller than its input; no
    sort, no window, no join, no distinct expansion. At 100 TB this
    is three shrinking shuffles. The band is FLOOR of one IEEE
    division, identical on both engines."""
    c = _t(spark, sf_dir, "customer")
    cells = (
        c.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / F.lit(1000.0))
            .cast("bigint")
            .alias("band"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "band")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    grp = cells.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("l"),
        F.sum("n").cast("bigint").alias("n"),
    )
    return grp.groupBy("l").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("n").cast("bigint").alias("n_rows"),
    ).select(
        "l", "n_groups", "n_rows", (F.col("l") < 3).alias("violates_l3")
    )


# ---------------------------------------------------------------------------
# Round 12: Simpson diversity index (exact-rational concentration)
# ---------------------------------------------------------------------------


@register(
    "doc_simpson_diversity",
    """
    WITH cell AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS nl
      FROM documents GROUP BY 1, 2
    ),
    agg AS (
      SELECT source,
             CAST(SUM(nl) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_langs,
             CAST(SUM(nl * (nl - 1)) AS BIGINT) AS num
      FROM cell GROUP BY 1
    )
    SELECT source, n_docs, n_langs,
           CASE WHEN n_docs > 1 THEN
             1.0 - CAST(num AS DOUBLE)
                   / (CAST(n_docs AS DOUBLE)
                      * CAST(n_docs - 1 AS DOUBLE))
           END AS simpson_d
    FROM agg
    """,
)
def doc_simpson_diversity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Simpson's diversity index of the LANGUAGE mix per source —
    the concentration gate beside the Gini (``doc_source_gini``) and
    chi2 (``doc_source_lang_chi2``) screens: D = 1 − Σ nᵢ(nᵢ−1) /
    (N(N−1)), the probability two documents drawn WITHOUT replacement
    from a source differ in language. A source that collapsed to one
    language (D → 0) needs investigation before it dominates a mix.

    Exactness: the unbiased finite-sample form is a RATIO OF EXACT
    INTEGERS — Σ nᵢ(nᵢ−1) and N(N−1) are bigint — so the only float
    operation is the single final division, bit-identical on both
    engines (no entropy/log in sight; this is why Simpson, not
    Shannon, is the cross-engine-exact diversity measure — the
    documented log-ulps blocker keeps Shannon rows-only).

    Scale shape: one (source, lang) hash-agg over the corpus, then a
    |sources × langs|-row rollup. Map-side combine does the heavy
    lifting; nothing but the first agg touches the corpus."""
    from .workloads_llm import _docs

    cell = (
        _docs(spark, sf_dir)
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nl"))
    )
    agg = cell.groupBy("source").agg(
        F.sum("nl").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_langs"),
        F.sum(F.col("nl") * (F.col("nl") - 1))
        .cast("bigint")
        .alias("num"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_langs",
        F.when(
            F.col("n_docs") > 1,
            F.lit(1.0)
            - F.col("num").cast("double")
            / (
                F.col("n_docs").cast("double")
                * (F.col("n_docs") - 1).cast("double")
            ),
        ).alias("simpson_d"),
    )
