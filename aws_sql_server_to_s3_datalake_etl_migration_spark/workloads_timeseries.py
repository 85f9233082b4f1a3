"""Time-series regularization + sketch workloads (round 5).

Gap-filling, rolling anomaly detection, and mergeable heavy-hitter
sketches over the event stream / document corpus — the densify-and-
monitor layer a production lake runs on top of the rollups the
reference pipeline lands (reference `table_jobs/*` stops at raw
extracts; SURVEY.md §2.5/§2.10 extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import register
from .sources.readers import read_table_dir
from .workloads import _dec, _events


@register(
    "events_gapfill_locf",
    """
    WITH hourly AS (
      SELECT event_type, DATE_TRUNC('hour', ts) AS bucket_start,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
               AS locf_sum_value
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MIN(bucket_start) AS lo, MAX(bucket_start) AS hi
      FROM hourly GROUP BY 1
    ),
    grid AS (
      SELECT event_type,
             UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR))
               AS bucket_start
      FROM bounds
    )
    SELECT g.event_type, g.bucket_start,
           COALESCE(h.n_events, 0) AS n_events,
           LAST_VALUE(h.locf_sum_value IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.bucket_start
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS locf_sum_value,
           h.n_events IS NULL AS is_filled
    FROM grid g LEFT JOIN hourly h USING (event_type, bucket_start)
    """,
)
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densified hourly series per event type: hours with no events
    appear with a zero count and the hourly value-sum carried forward
    from the last observed hour (`is_filled` marks synthesized rows).
    One map-side-combined bucket agg over the raw stream; the dense
    grid derives from the per-key bounds of the *aggregated* table via
    ``sequence``/``explode`` — the raw stream is scanned exactly once
    (operators/timeseries.py scale notes)."""
    from .operators.timeseries import gapfill_locf

    e = _events(spark, sf_dir)
    return gapfill_locf(
        e,
        ts_col="ts",
        key_cols=["event_type"],
        agg_exprs={
            "n_events": F.count(F.lit(1)),
            "locf_sum_value": F.sum(_dec("value")).cast("double"),
        },
        locf_cols=["locf_sum_value"],
        zero_cols=["n_events"],
        step="1 hour",
    )


@register(
    "events_gapfill_interpolate",
    """
    WITH hourly AS (
      SELECT event_type, DATE_TRUNC('hour', ts) AS bucket_start,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
               AS avg_value
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MIN(bucket_start) AS lo, MAX(bucket_start) AS hi
      FROM hourly GROUP BY 1
    ),
    grid AS (
      SELECT event_type,
             UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR))
               AS bucket_start
      FROM bounds
    ),
    dense AS (
      SELECT g.event_type, g.bucket_start,
             COALESCE(h.n_events, 0) AS n_events,
             h.avg_value,
             h.n_events IS NULL AS is_filled
      FROM grid g LEFT JOIN hourly h USING (event_type, bucket_start)
    ),
    nbrs AS (
      SELECT *, CAST(epoch(bucket_start) AS BIGINT) AS pos,
        LAST_VALUE(avg_value IGNORE NULLS) OVER wb AS prev_v,
        LAST_VALUE(CASE WHEN avg_value IS NOT NULL
                        THEN CAST(epoch(bucket_start) AS BIGINT) END
                   IGNORE NULLS) OVER wb AS prev_p,
        FIRST_VALUE(avg_value IGNORE NULLS) OVER wf AS next_v,
        FIRST_VALUE(CASE WHEN avg_value IS NOT NULL
                         THEN CAST(epoch(bucket_start) AS BIGINT) END
                    IGNORE NULLS) OVER wf AS next_p
      FROM dense
      WINDOW
        wb AS (PARTITION BY event_type ORDER BY bucket_start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wf AS (PARTITION BY event_type ORDER BY bucket_start
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, bucket_start, n_events,
           CASE WHEN avg_value IS NOT NULL THEN avg_value
                WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                THEN prev_v + (next_v - prev_v)
                     * (CAST(pos - prev_p AS DOUBLE) / (next_p - prev_p))
           END AS avg_value,
           is_filled
    FROM nbrs
    """,
)
def events_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densified hourly series with *linear interpolation*: missing
    hours get the value lerped between the nearest observed neighbors
    (proportional to real time delta; leading/trailing gaps stay null
    — no extrapolation). Same single-scan grid plan as
    ``events_gapfill_locf``; the two neighbor windows share one sort
    per direction (operators/timeseries.py interpolate_linear)."""
    from .operators.timeseries import gapfill_locf, interpolate_linear

    e = _events(spark, sf_dir)
    dense = gapfill_locf(
        e,
        ts_col="ts",
        key_cols=["event_type"],
        agg_exprs={
            "n_events": F.count(F.lit(1)),
            "avg_value": F.sum(_dec("value")).cast("double")
            / F.count(F.lit(1)),
        },
        locf_cols=[],
        zero_cols=["n_events"],
        step="1 hour",
    ).select("event_type", "bucket_start", "n_events", "avg_value",
             "is_filled")
    return interpolate_linear(
        dense, "avg_value", ["event_type"], "bucket_start"
    )


@register(
    "events_anomaly_zscore",
    """
    WITH hourly AS (
      SELECT event_type, DATE_TRUNC('hour', ts) AS bucket_start,
             COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MIN(bucket_start) AS lo, MAX(bucket_start) AS hi
      FROM hourly GROUP BY 1
    ),
    grid AS (
      SELECT event_type,
             UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR))
               AS bucket_start
      FROM bounds
    ),
    dense AS (
      SELECT g.event_type, g.bucket_start,
             COALESCE(h.n_events, 0) AS n_events
      FROM grid g LEFT JOIN hourly h USING (event_type, bucket_start)
    ),
    win AS (
      SELECT event_type, bucket_start, n_events,
             SUM(n_events) OVER w AS sum_n,
             SUM(n_events * n_events) OVER w AS sum_n2,
             COUNT(n_events) OVER w AS cnt
      FROM dense
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket_start
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    ),
    scored AS (
      SELECT event_type, bucket_start, n_events,
             CASE WHEN cnt >= 12
                       AND (CAST(sum_n2 AS DOUBLE)
                            - CAST(sum_n AS DOUBLE) * sum_n / cnt) > 0.0
                  THEN (CAST(n_events AS DOUBLE)
                        - CAST(sum_n AS DOUBLE) / cnt)
                       / sqrt((CAST(sum_n2 AS DOUBLE)
                               - CAST(sum_n AS DOUBLE) * sum_n / cnt)
                              / (cnt - 1))
             END AS zscore
      FROM win
    )
    SELECT event_type, bucket_start, n_events, zscore,
           CASE WHEN zscore IS NULL THEN FALSE
                ELSE abs(zscore) > 3.0 END AS is_anomaly
    FROM scored
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags over the densified hourly event
    counts: each hour scored against its trailing 24-hour window
    (current hour excluded; < 12 trailing points or zero variance →
    null score). Statistics come from exact int64 window sums with
    mean/variance derived in one fixed double expression, so Spark and
    the oracle agree to the last bit (operators/timeseries.py)."""
    from .operators.timeseries import gapfill_locf, rolling_zscore

    e = _events(spark, sf_dir)
    dense = gapfill_locf(
        e,
        ts_col="ts",
        key_cols=["event_type"],
        agg_exprs={"n_events": F.count(F.lit(1))},
        locf_cols=[],
        zero_cols=["n_events"],
        step="1 hour",
    ).select("event_type", "bucket_start", "n_events")
    return rolling_zscore(
        dense,
        value_col="n_events",
        key_cols=["event_type"],
        order_col="bucket_start",
        lookback=24,
        min_periods=12,
        threshold=3.0,
    )


@register(
    "events_lateness_profile",
    """
    WITH r AS (
      SELECT epoch_ns(ts) AS e,
             MAX(epoch_ns(ts)) OVER (ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pm
      FROM events
    ),
    agg AS (
      SELECT COUNT(*) AS n_events,
        CAST(SUM(CASE WHEN pm - e > 60000000000 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_late_gt_1_minute,
        CAST(SUM(CASE WHEN pm - e > 300000000000 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_late_gt_5_minutes,
        CAST(SUM(CASE WHEN pm - e > 900000000000 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_late_gt_15_minutes,
        CAST(SUM(CASE WHEN pm - e > 3600000000000 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_late_gt_1_hour,
        CAST(MAX(pm - e) // 1000000000 AS BIGINT) AS max_lateness_sec
      FROM r
    )
    SELECT *,
      CASE
        WHEN CAST(n_late_gt_1_minute AS DOUBLE) / n_events <= 0.001
          THEN '1 minute'
        WHEN CAST(n_late_gt_5_minutes AS DOUBLE) / n_events <= 0.001
          THEN '5 minutes'
        WHEN CAST(n_late_gt_15_minutes AS DOUBLE) / n_events <= 0.001
          THEN '15 minutes'
        WHEN CAST(n_late_gt_1_hour AS DOUBLE) / n_events <= 0.001
          THEN '1 hour'
      END AS suggested_delay
    FROM agg
    """,
)
def events_lateness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-delay advisor over the event stream: per-record
    lateness against the arrival-order prefix max (computed with the
    two-pass chunk-carry pattern — parallel within-chunk windows plus
    one tiny carry window over |chunks| rows, never a global
    single-task window over the corpus), reduced to threshold
    exceedance counts and the smallest delay losing ≤0.1% of records
    (operators/watermarking.py)."""
    from .operators.watermarking import lateness_profile

    e = _events(spark, sf_dir)
    return lateness_profile(e, ts_ns_col="ts_ns", arrival_col="event_id")


@register(
    "orders_unpivot_metrics",
    """
    WITH m AS (
      SELECT o_orderpriority,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS total_price,
             CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) AS n_customers
      FROM orders GROUP BY 1
    )
    SELECT o_orderpriority, metric, value FROM (
      SELECT o_orderpriority, 'n_orders' AS metric,
             CAST(n_orders AS DOUBLE) AS value FROM m
      UNION ALL
      SELECT o_orderpriority, 'total_price', total_price FROM m
      UNION ALL
      SELECT o_orderpriority, 'n_customers', n_customers FROM m
    )
    """,
)
def orders_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshaping via the DataFrame ``unpivot`` (melt) API:
    per-priority metrics pivoted into (metric, value) rows — the shape
    BI exports and metric stores ingest. The unpivot is a zero-shuffle
    projection (each input row expands to |metrics| rows in place);
    only the upstream agg shuffles."""
    m = (
        read_table_dir(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_price"),
            F.count_distinct("o_custkey").cast("double")
            .alias("n_customers"),
        )
    )
    return m.unpivot(
        ids=["o_orderpriority"],
        values=["n_orders", "total_price", "n_customers"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "events_rolling_active_users",
    """
    WITH ud AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    days AS (SELECT DISTINCT d FROM ud),
    spread AS (
      SELECT ud.d + CAST(off AS INT) AS wd, ud.user_id
      FROM ud, UNNEST(generate_series(0, 6)) AS t(off)
    )
    SELECT days.d AS day, COUNT(DISTINCT spread.user_id) AS users_7d
    FROM spread JOIN days ON spread.wd = days.d
    GROUP BY days.d
    """,
)
def events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per observed day (the WAU curve):
    each distinct (user, day) pair is spread onto the 7 window-end
    days it contributes to, then an exact distinct count per day. The
    spread works on the *deduplicated* user-day table (one shuffle to
    |user-days|, never raw events × 7), the day-restriction join is a
    broadcast of the tiny distinct-days list, and the final
    count-distinct is the standard two-phase hash agg. Exact — no
    sketch — because WAU/MAU is usually a reported business metric;
    the HLL path (`events_rollup_incremental`) covers the approximate
    regime."""
    e = _events(spark, sf_dir)
    ud = e.select(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    days = ud.select("d").distinct()
    spread = ud.withColumn(
        "off", F.explode(F.sequence(F.lit(0), F.lit(6)))
    ).select(F.date_add("d", F.col("off")).alias("wd"), "user_id")
    return (
        spread.join(
            F.broadcast(days), spread.wd == days.d
        )
        .groupBy(F.col("d").alias("day"))
        .agg(F.count_distinct("user_id").alias("users_7d"))
    )


@register(
    "events_variant_props",
    """
    SELECT CAST(CAST(json_extract_string(props, '$.k') AS INT) // 10
                AS BIGINT) AS k_decile,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events
    WHERE props IS NOT NULL
    GROUP BY 1
    """,
)
def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through Spark 4's VARIANT type:
    ``parse_json`` decodes each record once into the binary variant
    encoding and ``variant_get`` extracts typed fields from it — the
    scale path when many fields are pulled from the same JSON blob
    (repeated ``get_json_object`` re-parses the string per field;
    variant parses once). Aggregates by the extracted key's decile.
    All JVM-side; the oracle reads the same field with DuckDB's JSON
    functions."""
    e = _events(spark, sf_dir).where(F.col("props").isNotNull())
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return (
        e.groupBy(
            F.floor(k / 10).cast("bigint").alias("k_decile")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
    )


@register(
    "doc_source_drift",
    """
    WITH toks AS (
      SELECT source AS src,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
      FROM documents WHERE trim(text) <> ''
    ),
    per_src AS (
      SELECT src, term, COUNT(*) AS n_st FROM toks GROUP BY 1, 2
    ),
    src_tot AS (SELECT src, SUM(n_st) AS tot_s FROM per_src GROUP BY 1),
    corpus AS (SELECT term, SUM(n_st) AS n_t FROM per_src GROUP BY 1),
    corpus_tot AS (SELECT SUM(n_t) AS tot_c FROM corpus),
    j AS (
      SELECT p.src, p.n_st, s.tot_s, c.n_t, t.tot_c
      FROM per_src p
      JOIN src_tot s USING (src)
      JOIN corpus c USING (term), corpus_tot t
    )
    SELECT src AS source,
           CAST(SUM(CAST(abs(CAST(n_st AS DOUBLE) / tot_s
                             - CAST(n_t AS DOUBLE) / tot_c)
                         AS DECIMAL(18,12)))
                + (CAST(1 AS DECIMAL(18,12))
                   - SUM(CAST(CAST(n_t AS DOUBLE) / tot_c
                              AS DECIMAL(18,12))))
                AS DOUBLE) AS l1_drift
    FROM j GROUP BY src
    """,
)
def doc_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary drift: L1 distance between each source's
    term distribution and the corpus-wide one — the off-distribution
    monitor for training mixes. Log-free (engine-exact ratio math,
    decimal-accumulated sums) and joins only aggregated vocab tables
    (operators/textops.py source_term_drift)."""
    from .operators.textops import source_term_drift

    return source_term_drift(
        read_table_dir(spark, sf_dir, "documents"), "text", "source"
    )


@register(
    "doc_frequent_terms_sketch",
    """
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
      FROM documents
      WHERE trim(text) <> ''
    )
    SELECT term, COUNT(*) AS est_count, CAST(0 AS BIGINT) AS max_err
    FROM toks
    GROUP BY term
    ORDER BY est_count DESC, term ASC
    LIMIT 50
    """,
)
def doc_frequent_terms_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 corpus terms via mergeable batched Misra-Gries summaries
    (operators/sketches.py): documents — not exploded tokens — cross
    the Arrow boundary, tokenization + counting run vectorized per
    batch, and only ~capacity summary rows per partition reach the
    merge — the bounded-memory path for vocabularies too large to
    groupBy exactly. At this capacity (4096) every test corpus is
    within the exact regime (max_err = 0), which is what the oracle
    checks; the lossy-regime guarantees are pinned by differential
    pytests."""
    from .operators.sketches import frequent_terms

    docs = read_table_dir(spark, sf_dir, "documents")
    return frequent_terms(
        docs, term_col="text", capacity=4096, k=50, tokenize=True
    )


@register(
    "events_seasonal_baseline",
    """
    WITH hourly AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(date_part('hour', ts) AS BIGINT) AS hod,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    baseline AS (
      SELECT CAST(dayofweek(d) AS BIGINT) AS dow, hod,
             CAST(SUM(n_events) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS baseline_mean,
             CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM hourly GROUP BY 1, 2
    )
    SELECT h.d, h.hod, h.n_events, b.baseline_mean, b.n_obs,
           h.n_events > 2.0 * b.baseline_mean AS is_anomalous
    FROM hourly h
    JOIN baseline b
      ON CAST(dayofweek(h.d) AS BIGINT) = b.dow AND h.hod = b.hod
    """,
)
def events_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-week seasonal baseline: each (date, hour) traffic count
    scored against the mean for its (day-of-week, hour) slot — the
    standard seasonality-aware volume monitor (a Monday-9am spike is
    normal; the same count at Sunday-3am is an incident). Every input
    to the comparison is an aggregate: hourly buckets (one row per
    date x hour), the 168-slot baseline (broadcastable forever), one
    aggregated join — raw events are scanned once and never shuffled
    beyond the bucket agg. Counts are exact int64; the mean is one
    bigint/bigint double division, engine-identical.

    DOW convention: Spark's dayofweek() is 1=Sunday, DuckDB's is
    0=Sunday — the Spark side subtracts 1.
    """
    e = _events(spark, sf_dir)
    hourly = e.groupBy(
        F.col("ts").cast("date").alias("d"),
        F.hour("ts").cast("bigint").alias("hod"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    baseline = hourly.groupBy(
        (F.dayofweek("d") - 1).cast("bigint").alias("dow"),
        "hod",
    ).agg(
        (
            F.sum("n_events").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("baseline_mean"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    keyed = hourly.withColumn(
        "dow", (F.dayofweek("d") - 1).cast("bigint")
    )
    return (
        keyed.join(F.broadcast(baseline), ["dow", "hod"])
        .select(
            "d",
            "hod",
            "n_events",
            "baseline_mean",
            "n_obs",
            (
                F.col("n_events")
                > F.lit(2.0) * F.col("baseline_mean")
            ).alias("is_anomalous"),
        )
    )


@register(
    "session_incident_overlap",
    """
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS ts_us FROM events
    ),
    marks AS (
      SELECT user_id, ts_us,
             CASE WHEN LAG(ts_us) OVER (PARTITION BY user_id
                                        ORDER BY ts_us) IS NULL
                  OR ts_us - LAG(ts_us) OVER (PARTITION BY user_id
                                              ORDER BY ts_us)
                     > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM ev
    ),
    numbered AS (
      SELECT user_id, ts_us,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
                               ROWS UNBOUNDED PRECEDING) AS sidx
      FROM marks
    ),
    sessions AS (
      SELECT user_id, CAST(sidx AS BIGINT) AS sidx,
             MIN(ts_us) AS s_us, MAX(ts_us) AS e_us
      FROM numbered GROUP BY 1, 2
    ),
    hourly AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(date_part('hour', ts) AS BIGINT) AS hod,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    baseline AS (
      SELECT CAST(dayofweek(d) AS BIGINT) AS dow, hod,
             CAST(SUM(n_events) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS mean_n
      FROM hourly GROUP BY 1, 2
    ),
    incidents AS (
      SELECT epoch_us(CAST(h.d AS TIMESTAMP)) + h.hod * 3600000000
               AS i_s_us,
             epoch_us(CAST(h.d AS TIMESTAMP)) + h.hod * 3600000000
               + 3599999999 AS i_e_us
      FROM hourly h
      JOIN baseline b
        ON CAST(dayofweek(h.d) AS BIGINT) = b.dow AND h.hod = b.hod
      WHERE h.n_events > 1.2 * b.mean_n
    )
    SELECT s.user_id, s.sidx, s.s_us, s.e_us, i.i_s_us
    FROM sessions s JOIN incidents i
      ON s.s_us <= i.i_e_us AND i.i_s_us <= s.e_us
    """,
)
def session_incident_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which user sessions were in flight during busier-than-baseline
    hours (>1.2x the hour-of-week mean) — 30-min-gap sessionization (lag + running-sum windows, one
    user_id exchange) interval-joined against the seasonal-baseline
    incident hours via the BINNED overlap join
    (operators/temporal.py interval_overlap_join): explode onto hour
    bins, equi-join on the bin, exact predicate + first-shared-bin
    dedup — never the sessions x incidents theta join the inequality
    condition would otherwise plan (the oracle IS that theta join,
    exact over int64 epoch-micros)."""
    from pyspark.sql.window import Window

    from .operators.temporal import interval_overlap_join

    e = _events(spark, sf_dir).select(
        "user_id", F.col("ts_ns")
    ).select("user_id", F.expr("ts_ns div 1000").alias("ts_us"))
    wo = Window.partitionBy("user_id").orderBy("ts_us")
    wr = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.col("ts_us") - F.lag("ts_us").over(wo)
    marks = e.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0),
    )
    numbered = marks.withColumn("sidx", F.sum("is_new").over(wr))
    sessions = numbered.groupBy(
        "user_id", F.col("sidx").cast("bigint").alias("sidx")
    ).agg(F.min("ts_us").alias("s_us"), F.max("ts_us").alias("e_us"))

    ev = _events(spark, sf_dir)
    # Persist the hour-grain rollup: both the baseline aggregate and
    # the incident join derive from it — unpersisted, the event
    # stream was scanned and re-aggregated twice (plan audit: three
    # events scans total). |days x 24| rows, tiny.
    # Materialize-then-release (r14 optimization, guide §5).
    hourly = ev.groupBy(
        F.col("ts").cast("date").alias("d"),
        F.hour("ts").cast("bigint").alias("hod"),
    ).agg(F.count(F.lit(1)).alias("n_events")).persist()
    baseline = hourly.groupBy(
        (F.dayofweek("d") - 1).cast("bigint").alias("dow"), "hod"
    ).agg(
        (
            F.sum("n_events").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_n")
    )
    start_us = (
        F.unix_micros(F.col("d").cast("timestamp"))
        + F.col("hod") * F.lit(3_600_000_000)
    )
    incidents = (
        hourly.withColumn(
            "dow", (F.dayofweek("d") - 1).cast("bigint")
        )
        .join(F.broadcast(baseline), ["dow", "hod"])
        .where(F.col("n_events") > F.lit(1.2) * F.col("mean_n"))
        .select(
            start_us.alias("i_s_us"),
            (start_us + F.lit(3_599_999_999)).alias("i_e_us"),
        )
    )
    try:
        res = interval_overlap_join(
            sessions, incidents, "s_us", "e_us", "i_s_us", "i_e_us"
        ).select("user_id", "sidx", "s_us", "e_us", "i_s_us")
        res = res.persist()
        res.count()
        return res
    finally:
        hourly.unpersist()


@register(
    "events_salted_type_stats",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact,
           CAST(MIN(event_id) AS BIGINT) AS first_event_id,
           CAST(MAX(event_id) AS BIGINT) AS last_event_id
    FROM events
    GROUP BY event_type
    """,
)
def events_salted_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type stats through the SALTED two-stage aggregation
    (operators/skew.py two_stage_agg): event_type has single-digit
    cardinality, so the plain plan funnels every row of a type into
    one reduce task — the canonical hot-key aggregate. Stage 1 groups
    by (type, salt) spreading each type over 16 tasks; stage 2
    recombines the algebraic partials. The distinct-user count rides
    the same shape as a two-level exact distinct: (type, user) dedup
    first (cardinality-bounded), then a count per type. Results are
    salt-invariant by construction — value-checked against the plain
    GROUP BY oracle."""
    from .operators.skew import two_stage_agg

    e = _events(spark, sf_dir).select("event_type", "user_id", "event_id")
    base = two_stage_agg(
        e,
        ["event_type"],
        {
            "n_events": ("count", "event_id"),
            "first_event_id": ("min", "event_id"),
            "last_event_id": ("max", "event_id"),
        },
    )
    users = (
        e.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users_exact"))
    )
    return base.join(users, "event_type").select(
        "event_type", "n_events", "n_users_exact",
        "first_event_id", "last_event_id",
    )


# ---------------------------------------------------------------------------
# Change-point candidates (round 7): integer rolling level shift
# ---------------------------------------------------------------------------


@register(
    "events_change_points",
    """
    WITH hourly AS (
      SELECT event_type,
             epoch(date_trunc('hour', ts)) // 3600 AS hidx,
             COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ), framed AS (
      SELECT event_type, hidx,
             COALESCE(SUM(cnt) OVER (PARTITION BY event_type ORDER BY hidx
               RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING), 0) AS prev_sum,
             COALESCE(SUM(cnt) OVER (PARTITION BY event_type ORDER BY hidx
               RANGE BETWEEN CURRENT ROW AND 23 FOLLOWING), 0) AS next_sum,
             MIN(hidx) OVER (PARTITION BY event_type) AS lo,
             MAX(hidx) OVER (PARTITION BY event_type) AS hi
      FROM hourly
    )
    SELECT event_type,
           CAST(hidx AS BIGINT) AS hour_idx,
           CAST(prev_sum AS BIGINT) AS prev_sum,
           CAST(next_sum AS BIGINT) AS next_sum,
           CAST(next_sum - prev_sum AS BIGINT) AS diff
    FROM framed
    WHERE hidx - lo >= 24 AND hi - hidx >= 23
      AND abs(next_sum - prev_sum) >= 25
    """,
)
def events_change_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-shift candidates (operators/timeseries.py
    rolling_change_points): hours where the next-24h event count moves
    ≥25 away from the previous 24h, per event type. Integer RANGE
    windows over the hourly aggregate — missing hours count zero
    without gapfill, no floats anywhere, windows run over
    (types x hours) rows, never the raw corpus."""
    from .operators.timeseries import rolling_change_points

    return rolling_change_points(
        _events(spark, sf_dir), "event_type", "ts",
        window_hours=24, min_abs_diff=25,
    )


# ---------------------------------------------------------------------------
# Sliding-window aggregation (round 7)
# ---------------------------------------------------------------------------


@register(
    "events_sliding_windows",
    """
    WITH slots AS (
      SELECT event_type,
             date_trunc('hour', ts) - i * INTERVAL 1 HOUR AS window_start
      FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i)
    )
    SELECT window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM slots GROUP BY 1, 2
    """,
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2h/1h window counts per event type — ``F.window`` with a
    slide, the overlapping-window twin of ``events_hourly_counts``
    (identical expression tree under Structured Streaming). Spark
    assigns each row its size/slide = 2 windows in the Expand-style
    generate; shuffle carries |windows x types| aggregate rows. The
    oracle derives the same assignment from first principles (each
    event lands in the hour-aligned window of its hour and the one
    before)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(
            F.window(F.col("ts"), "2 hours", "1 hour").alias("w"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# Mergeable HLL distinct rollup (round 8)
# ---------------------------------------------------------------------------


@register("events_hll_rollup", None)
def events_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user rollup through MERGEABLE HLL sketches: one pass
    builds a per-day sketch (hll_sketch_agg), per-day estimates read
    off the sketches, and the all-time estimate comes from
    hll_union_agg over the day sketches — history is NEVER rescanned
    to refresh the total, which is the 100 TB contract (daily
    sketches persist a few KB each; each new day unions in O(days)).
    Union-of-sketches equals a single sketch over the concatenated
    data (register-wise max), so the rollup is exactly as accurate as
    the one-shot sketch — that identity and a 5%-of-exact tolerance
    are pinned by pytest; catalog exposure is rows-only (HLL register
    state isn't SQL-expressible)."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    per_day = daily.select(
        F.col("day").cast("string").alias("grain"),
        F.hll_sketch_estimate("sk").alias("approx_users"),
    )
    total = (
        daily.agg(F.hll_union_agg("sk").alias("sk"))
        .select(
            F.lit("ALL").alias("grain"),
            F.hll_sketch_estimate("sk").alias("approx_users"),
        )
    )
    return per_day.unionByName(total).orderBy("grain")


# ---------------------------------------------------------------------------
# Time-weighted average (round 8): LOCF segment weighting, exact sums
# ---------------------------------------------------------------------------


@register(
    "events_time_weighted_avg",
    """
    WITH e AS (
      SELECT event_id, event_type,
             CAST(FLOOR(value * 10000) AS BIGINT) AS v_q,
             CAST(ts AS DATE) AS day,
             epoch_ns(ts) // 1000 AS ts_us
      FROM events
    ), seg AS (
      SELECT event_type, day, v_q, ts_us,
             COALESCE(
               LEAD(ts_us) OVER (PARTITION BY event_type, day
                                 ORDER BY ts_us, event_id),
               epoch_ns(CAST(day + 1 AS TIMESTAMP)) // 1000
             ) - ts_us AS dt_us
      FROM e
    )
    SELECT event_type, day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(dt_us) AS BIGINT) AS total_us,
           CAST(SUM(CAST(v_q AS DECIMAL(18,0))
                    * CAST(dt_us AS DECIMAL(18,0))) AS DOUBLE)
             / CAST(SUM(dt_us) AS DOUBLE) / 10000 AS twa
    FROM seg GROUP BY event_type, day
    """,
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of ``value`` per (event_type, day) — the
    irregular-sampling analytic (TimescaleDB ``time_weight``-style):
    each observation holds (LOCF) until the next one of its series,
    the last until midnight, so sparse bursts don't dominate the mean
    the way a row-average lets them. Weights are exact integer
    microseconds from the lossless ``ts_ns`` column; the value is
    floor-quantized to 1e-4 resolution (floor of an identical IEEE
    product is engine-portable, unlike decimal-cast rounding modes),
    the weighted sum accumulates as exact DECIMAL products, and the
    float tail is the same two-division expression on both engines —
    hash-exact against the oracle.

    Rewritten round 10: a (type, day) window is well-PARTITIONED but
    each partition holds a full type-day of events — at 10^9
    events/day/type that single task is the hot spot. The successor
    timestamp now comes from ``with_ordered_lead`` bucketed on the
    WITHIN-DAY offset (static 64-slice boundaries of the 86,400 s
    day — group-relative, since global ts quantiles would land every
    day in one bucket) with a plain (not broadcast) carry join:
    the carry table is |type-days| x 64 rows, which is exactly the
    regime the ``broadcast_carry=False`` knob exists for."""
    from .operators.ranking import with_ordered_lead

    _DAY_US = 86_400_000_000
    e = (
        _events(spark, sf_dir)
        .select(
            "event_id",
            "event_type",
            "ts",
            "ts_ns",
            F.floor(F.col("value") * 10000).cast("bigint").alias("v_q"),
        )
        .withColumn("day", F.to_date("ts"))
        .withColumn("ts_us", F.expr("ts_ns div 1000"))
        .withColumn(
            "us_in_day",
            F.col("ts_us")
            - F.unix_micros(F.col("day").cast("timestamp")),
        )
        # Persist across the lead pass's main + carry derivations
        # (boundaries are supplied, so the carry was the second full
        # events scan in the plan audit). Materialize-then-release
        # (r14 optimization, guide §5).
        .persist()
    )
    try:
        day_end_us = F.unix_micros(
            F.date_add(F.col("day"), 1).cast("timestamp")
        )
        led = with_ordered_lead(
            e,
            "us_in_day",
            [F.col("us_in_day"), F.col("event_id")],
            {"_next_us": "ts_us"},
            partition_cols=["event_type", "day"],
            boundaries=[_DAY_US * i / 64 for i in range(1, 64)],
            broadcast_carry=False,
        )
        seg = led.withColumn(
            "dt_us",
            F.coalesce(F.col("_next_us"), day_end_us) - F.col("ts_us"),
        )
        res = seg.groupBy("event_type", "day").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("dt_us").alias("total_us"),
            (
                F.sum(
                    F.col("v_q").cast("decimal(18,0)")
                    * F.col("dt_us").cast("decimal(18,0)")
                ).cast("double")
                / F.sum("dt_us").cast("double")
                / F.lit(10000)
            ).alias("twa"),
        )
        res = res.persist()
        res.count()
        return res
    finally:
        e.unpersist()


# ---------------------------------------------------------------------------
# OHLC bars (round 8): deterministic open/close, exact extremes
# ---------------------------------------------------------------------------


@register(
    "events_ohlc_bars",
    """
    WITH e AS (
      SELECT event_id, event_type, value,
             epoch_ns(ts) // 1000 AS ts_us
      FROM events
    ), h AS (
      SELECT *, (ts_us // 3600000000) * 3600000000 AS hour_us FROM e
    ), r AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY event_type, hour_us
                                ORDER BY ts_us, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, hour_us
                                ORDER BY ts_us DESC, event_id DESC) AS rn_d
      FROM h
    )
    SELECT event_type, CAST(hour_us AS BIGINT) AS hour_us,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(CASE WHEN rn_a = 1 THEN value END) AS DOUBLE) AS open,
           CAST(MAX(value) AS DOUBLE) AS high,
           CAST(MIN(value) AS DOUBLE) AS low,
           CAST(MAX(CASE WHEN rn_d = 1 THEN value END) AS DOUBLE) AS close
    FROM r GROUP BY event_type, hour_us
    """,
)
def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC candles per event type — the market-data rollup
    shape: open/close are the first/last observation under a
    deterministic (ts, id) order, high/low exact extremes; every
    output is an exact value of the input, no float arithmetic at
    all, so the oracle hash-matches.

    Rewritten round 10: the first/last election needed NO window at
    all — ``min_by``/``max_by`` over the unique (ts, id) order struct
    fold open/close into the SAME map-side-combinable hash-agg as the
    extremes, so a type-hour holding 10^8 events costs one combine
    tree instead of two full per-partition sorts. The oracle keeps
    its ROW_NUMBER formulation (single-node DuckDB doesn't care);
    values are identical because the order key is unique."""
    e = (
        _events(spark, sf_dir)
        .select("event_id", "event_type", "value", "ts_ns")
        .withColumn("ts_us", F.expr("ts_ns div 1000"))
        .withColumn(
            "hour_us",
            F.expr("(ts_us div 3600000000) * 3600000000").cast("bigint"),
        )
    )
    okey = F.struct(F.col("ts_us"), F.col("event_id"))
    return e.groupBy("event_type", "hour_us").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min_by("value", okey).cast("double").alias("open"),
        F.max("value").cast("double").alias("high"),
        F.min("value").cast("double").alias("low"),
        F.max_by("value", okey).cast("double").alias("close"),
    )


# ---------------------------------------------------------------------------
# Autocorrelation profile (round 8): periodicity detection per series
# ---------------------------------------------------------------------------


@register(
    "events_acf_daily",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             COUNT(*) AS y
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, k.lag,
             y AS a,
             LAG(y, k.lag) OVER (PARTITION BY event_type, k.lag
                                 ORDER BY day) AS b
      FROM daily CROSS JOIN (
        SELECT CAST(i AS INT) AS lag FROM range(1, 8) t(i)
      ) k
    ),
    stats AS (
      SELECT event_type, lag,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(a) AS HUGEINT) AS sa,
             CAST(SUM(b) AS HUGEINT) AS sb,
             CAST(SUM(CAST(a AS HUGEINT) * b) AS HUGEINT) AS sab,
             CAST(SUM(CAST(a AS HUGEINT) * a) AS HUGEINT) AS saa,
             CAST(SUM(CAST(b AS HUGEINT) * b) AS HUGEINT) AS sbb
      FROM lagged WHERE b IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT event_type, lag, CAST(n AS BIGINT) AS n_pairs,
           CASE WHEN CAST(n * saa - sa * sa AS DOUBLE) > 0
                 AND CAST(n * sbb - sb * sb AS DOUBLE) > 0
                THEN CAST(n * sab - sa * sb AS DOUBLE)
                     / (SQRT(CAST(n * saa - sa * sa AS DOUBLE))
                        * SQRT(CAST(n * sbb - sb * sb AS DOUBLE)))
           END AS acf
    FROM stats
    """,
)
def events_acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..7 autocorrelation of the daily event count per type —
    the periodicity screen that decides whether a seasonal baseline
    (events_seasonal_baseline) is even applicable. Exact integer
    sufficient statistics cross the shuffle (operators/timeseries.py
    autocorrelation): Pearson r assembled with one fixed double
    expression, bit-identical across engines and partition orderings
    where a float-accumulating corr() would not be. One window sort
    per type produces all 7 lag columns; daily pre-aggregation means
    the window sees ~days rows per group, never raw events."""
    from .operators.timeseries import autocorrelation

    daily = (
        _events(spark, sf_dir)
        .groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        )
        .agg(F.count(F.lit(1)).alias("y"))
    )
    return autocorrelation(
        daily, "event_type", "day", "y", max_lag=7
    )


# ---------------------------------------------------------------------------
# Session path mining (round 8): top navigation prefixes
# ---------------------------------------------------------------------------


@register(
    "events_top_paths",
    """
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                   OR date_diff('microsecond', LAG(ts) OVER w, ts)
                      > 1800000000 THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_no
      FROM seq
    ),
    ranked AS (
      SELECT user_id, session_no, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, session_no
                                ORDER BY ts, event_id) AS rn
      FROM sess
    ),
    paths AS (
      SELECT user_id, session_no,
             STRING_AGG(event_type, '>' ORDER BY rn) AS path
      FROM ranked WHERE rn <= 3
      GROUP BY 1, 2
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY 1
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency of the first-3-event-type prefix of every user
    session (30-minute inactivity gap) — the navigation-path rollup
    behind funnel design. Gap test in exact epoch MICROseconds
    (unix_micros both sides — a seconds-truncating diff would split
    sessions differently per engine); path assembly sorts the
    (unique) in-session rank inside the aggregate, so the string is
    deterministic under any partitioning. Path cardinality is bounded
    by |event_type|³, so the final rollup never skews."""
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = w_u.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev = _events(spark, sf_dir).select(
        "user_id", "ts", "event_id", "event_type"
    )
    sess = (
        ev.withColumn("_prev", F.lag("ts").over(w_u))
        .withColumn(
            "brk",
            F.when(
                F.col("_prev").isNull()
                | (
                    F.unix_micros("ts") - F.unix_micros("_prev")
                    > 1800 * 1000 * 1000
                ),
                1,
            ).otherwise(0),
        )
        .withColumn("session_no", F.sum("brk").over(w_cum))
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("user_id", "session_no")
            .orderBy("ts", "event_id")
        ))
        .where(F.col("rn") <= 3)
    )
    paths = sess.groupBy("user_id", "session_no").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
        ).alias("path")
    )
    return paths.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_sessions")
    )


# ---------------------------------------------------------------------------
# Cross-correlation (round 8): which series leads which
# ---------------------------------------------------------------------------

_XCORR_PAIRS = [
    ("click", "purchase"),
    ("view", "click"),
    ("signup", "purchase"),
]


@register(
    "events_cross_correlation",
    f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS c_click,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS c_purchase,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               AS c_view,
             SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
               AS c_signup
      FROM events GROUP BY 1
    ),
    series AS (
      {" UNION ALL ".join(
          f"SELECT '{a}->{b}' AS pair, day, c_{a} AS a, c_{b} AS b "
          "FROM daily"
          for a, b in _XCORR_PAIRS
      )}
    ),
    shifted AS (
      SELECT pair, s.shift, a,
             CASE s.shift
               WHEN -3 THEN LAG(b, 3) OVER w
               WHEN -2 THEN LAG(b, 2) OVER w
               WHEN -1 THEN LAG(b, 1) OVER w
               WHEN 0 THEN b
               WHEN 1 THEN LEAD(b, 1) OVER w
               WHEN 2 THEN LEAD(b, 2) OVER w
               WHEN 3 THEN LEAD(b, 3) OVER w
             END AS bs
      FROM series CROSS JOIN (
        SELECT CAST(i AS INT) AS shift FROM range(-3, 4) t(i)
      ) s
      WINDOW w AS (PARTITION BY pair, s.shift ORDER BY day)
    ),
    stats AS (
      SELECT pair, shift,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(a) AS HUGEINT) AS sa,
             CAST(SUM(bs) AS HUGEINT) AS sb,
             CAST(SUM(CAST(a AS HUGEINT) * bs) AS HUGEINT) AS sab,
             CAST(SUM(CAST(a AS HUGEINT) * a) AS HUGEINT) AS saa,
             CAST(SUM(CAST(bs AS HUGEINT) * bs) AS HUGEINT) AS sbb
      FROM shifted WHERE bs IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT pair, shift, CAST(n AS BIGINT) AS n_pairs,
           CASE WHEN CAST(n * saa - sa * sa AS DOUBLE) > 0
                 AND CAST(n * sbb - sb * sb AS DOUBLE) > 0
                THEN CAST(n * sab - sa * sb AS DOUBLE)
                     / (SQRT(CAST(n * saa - sa * sa AS DOUBLE))
                        * SQRT(CAST(n * sbb - sb * sb AS DOUBLE)))
           END AS xcf
    FROM stats
    """,
)
def events_cross_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Lead/lag cross-correlation (shifts -3..+3 days) between daily
    count series of event-type pairs — does clicking today predict
    purchasing tomorrow (operators/timeseries.py cross_correlation).
    The wide daily pivot (one conditional-sum pass over events) feeds
    three bounded pair series; exact integer sufficient statistics
    assemble each Pearson r bit-identically. Day grid = days with ANY
    event (absent types count 0 — a real zero, not a gap), so both
    engines see the identical grid by construction."""
    from .operators.timeseries import cross_correlation

    ev = _events(spark, sf_dir)
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        *[
            F.sum(
                F.when(F.col("event_type") == t, 1).otherwise(0)
            ).alias(f"c_{t}")
            for t in ("click", "purchase", "view", "signup")
        ]
    )
    series = None
    for a, b in _XCORR_PAIRS:
        part = daily.select(
            F.lit(f"{a}->{b}").alias("pair"),
            "day",
            F.col(f"c_{a}").alias("a"),
            F.col(f"c_{b}").alias("b"),
        )
        series = part if series is None else series.unionByName(part)
    return cross_correlation(
        series, "pair", "day", "a", "b", max_shift=3
    ).withColumnRenamed("group", "pair")


# ---------------------------------------------------------------------------
# Equi-width histogram (round 8)
# ---------------------------------------------------------------------------


@register(
    "events_value_histogram",
    """
    WITH bounds AS (
      SELECT MIN(value) AS lo, MAX(value) AS hi FROM events
    ),
    binned AS (
      SELECT event_type,
             CAST(LEAST(19, FLOOR((value - lo) * 20.0 / (hi - lo)))
                  AS INT) AS bin,
             lo, hi
      FROM events, bounds
    )
    SELECT event_type, bin,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(lo + bin * (hi - lo) / 20.0) AS bin_lo,
           MIN(lo + (bin + 1) * (hi - lo) / 20.0) AS bin_hi
    FROM binned GROUP BY 1, 2
    """,
)
def events_value_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """20-bin equi-width histogram of event value per type over the
    GLOBAL [min, max] — the profile-pane rollup. The 1-row bounds
    aggregate broadcasts back over the stream (scalar-subquery shape);
    the bin expression is the IDENTICAL double arithmetic on both
    engines (same multiply-then-divide order — a mathematically equal
    but differently-associated form can floor across a bin edge), so
    assignment is bit-deterministic. One map-side-combined (type, bin)
    agg; ≤ |types|x20 output rows."""
    ev = _events(spark, sf_dir)
    bounds = ev.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    binned = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        "lo",
        "hi",
        F.least(
            F.lit(19),
            F.floor(
                (F.col("value") - F.col("lo"))
                * F.lit(20.0)
                / (F.col("hi") - F.col("lo"))
            ),
        )
        .cast("int")
        .alias("bin"),
    )
    return binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(
            F.col("lo") + F.col("bin") * (F.col("hi") - F.col("lo")) / F.lit(20.0)
        ).alias("bin_lo"),
        F.min(
            F.col("lo")
            + (F.col("bin") + 1) * (F.col("hi") - F.col("lo")) / F.lit(20.0)
        ).alias("bin_hi"),
    )


# ---------------------------------------------------------------------------
# Audience overlap (round 8): exact co-engagement matrix
# ---------------------------------------------------------------------------


@register(
    "events_user_overlap",
    """
    WITH tu AS (
      SELECT DISTINCT event_type, user_id FROM events
    ),
    sizes AS (
      SELECT event_type, COUNT(*) AS n_users FROM tu GROUP BY 1
    ),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_common
      FROM tu a JOIN tu b ON a.user_id = b.user_id
      WHERE a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b,
           CAST(i.n_common AS BIGINT) AS n_common,
           CAST(sa.n_users AS BIGINT) AS n_users_a,
           CAST(sb.n_users AS BIGINT) AS n_users_b,
           CAST(i.n_common AS DOUBLE)
             / CAST(sa.n_users + sb.n_users - i.n_common AS DOUBLE)
             AS jaccard
    FROM inter i
    JOIN sizes sa ON i.type_a = sa.event_type
    JOIN sizes sb ON i.type_b = sb.event_type
    """,
)
def events_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact audience-overlap matrix between event types: distinct
    (type, user) first (the ONLY pass over raw events), then the
    per-user self-join — pair volume is Σ_user C(types_user, 2),
    bounded by |types|² x users, never events². Jaccard from exact
    integer counts with one double division. The exact ground truth
    the HLL rollup (events_hll_rollup) approximates; at 100 TB the
    sketch path serves dashboards and THIS query audits it on
    samples."""
    tu = (
        _events(spark, sf_dir)
        .select("event_type", "user_id")
        .distinct()
    )
    sizes = tu.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    a = tu.select(
        F.col("event_type").alias("type_a"), "user_id"
    )
    b = tu.select(
        F.col("event_type").alias("type_b"), "user_id"
    )
    inter = (
        a.join(b, on="user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(
        F.col("event_type").alias("type_a"),
        F.col("n_users").alias("n_users_a"),
    )
    sb = sizes.select(
        F.col("event_type").alias("type_b"),
        F.col("n_users").alias("n_users_b"),
    )
    return (
        inter.join(F.broadcast(sa), on="type_a")
        .join(F.broadcast(sb), on="type_b")
        .select(
            "type_a",
            "type_b",
            "n_common",
            "n_users_a",
            "n_users_b",
            (
                F.col("n_common").cast("double")
                / (
                    F.col("n_users_a")
                    + F.col("n_users_b")
                    - F.col("n_common")
                ).cast("double")
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# A/B conversion lift with CI (round 8)
# ---------------------------------------------------------------------------


@register(
    "events_ab_conversion_lift",
    """
    WITH assign AS (
      SELECT DISTINCT user_id,
             CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant
      FROM events
    ),
    converted AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ),
    counts AS (
      SELECT a.variant,
             COUNT(*) AS n_users,
             SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
               AS n_converted
      FROM assign a LEFT JOIN converted c ON a.user_id = c.user_id
      GROUP BY 1
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN variant = 'A' THEN n_users END) AS na,
        MAX(CASE WHEN variant = 'A' THEN n_converted END) AS ca,
        MAX(CASE WHEN variant = 'B' THEN n_users END) AS nb,
        MAX(CASE WHEN variant = 'B' THEN n_converted END) AS cb
      FROM counts
    )
    SELECT CAST(na AS BIGINT) AS n_users_a,
           CAST(ca AS BIGINT) AS n_conv_a,
           CAST(nb AS BIGINT) AS n_users_b,
           CAST(cb AS BIGINT) AS n_conv_b,
           CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) AS p_a,
           CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE) AS p_b,
           CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)
             - CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) AS lift,
           (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)
             - CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
             - 1.959963984540054 * SQRT(
                 (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
                 * (1.0 - CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
                 / CAST(na AS DOUBLE)
                 + (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
                 * (1.0 - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
                 / CAST(nb AS DOUBLE)) AS ci_lo,
           (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)
             - CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
             + 1.959963984540054 * SQRT(
                 (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
                 * (1.0 - CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
                 / CAST(na AS DOUBLE)
                 + (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
                 * (1.0 - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
                 / CAST(nb AS DOUBLE)) AS ci_hi
    FROM wide
    """,
)
def events_ab_conversion_lift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-proportion A/B readout: user-level conversion (any
    'purchase' event) per hash-assigned variant, absolute lift, and
    the Wald 95% CI — the decision row an experimentation pipeline
    lands. Everything flows from four EXACT integer counts (distinct
    users / distinct converters per variant — two distinct pre-aggs
    and a left semi-ish join, no raw-event pairwise work); the CI is
    ONE double expression with the z-value as a shared literal
    (1.959963984540054 — engine inverse-normal functions are not
    bit-identical, a literal is). Same engineered-determinism rule as
    the ACF/HHI family."""
    ev = _events(spark, sf_dir)
    assign = ev.select("user_id").distinct().select(
        "user_id",
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias(
            "variant"
        ),
    )
    converted = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("_conv", F.lit(1))
    )
    counts = (
        assign.join(converted, on="user_id", how="left")
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.coalesce(F.col("_conv"), F.lit(0))).alias(
                "n_converted"
            ),
        )
    )
    wide = counts.agg(
        F.max(F.when(F.col("variant") == "A", F.col("n_users"))).alias("na"),
        F.max(F.when(F.col("variant") == "A", F.col("n_converted"))).alias("ca"),
        F.max(F.when(F.col("variant") == "B", F.col("n_users"))).alias("nb"),
        F.max(F.when(F.col("variant") == "B", F.col("n_converted"))).alias("cb"),
    )
    pa = F.col("ca").cast("double") / F.col("na").cast("double")
    pb = F.col("cb").cast("double") / F.col("nb").cast("double")
    z = F.lit(1.959963984540054)
    se = F.sqrt(
        pa * (F.lit(1.0) - pa) / F.col("na").cast("double")
        + pb * (F.lit(1.0) - pb) / F.col("nb").cast("double")
    )
    return wide.select(
        F.col("na").cast("long").alias("n_users_a"),
        F.col("ca").cast("long").alias("n_conv_a"),
        F.col("nb").cast("long").alias("n_users_b"),
        F.col("cb").cast("long").alias("n_conv_b"),
        pa.alias("p_a"),
        pb.alias("p_b"),
        (pb - pa).alias("lift"),
        (pb - pa - z * se).alias("ci_lo"),
        (pb - pa + z * se).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# Cumulative reach (round 9): daily new users + running distinct total
# ---------------------------------------------------------------------------


@register(
    "events_cumulative_reach",
    """
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d FROM events GROUP BY 1
    ),
    daily AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS new_users
      FROM first_seen GROUP BY d
    )
    SELECT d, new_users,
           CAST(SUM(new_users) OVER (
             ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cumulative_users
    FROM daily
    """,
)
def events_cumulative_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily NEW users and the running DISTINCT-user total — the
    product-growth reach curve. Spark has no COUNT(DISTINCT) OVER, and
    the naive emulation (size of a windowed collect_set) is quadratic
    in memory; the exact linear plan is first-appearance semantics:
    per-user MIN(day) (one map-side-combined hash-agg over the
    stream), a per-day count of first appearances, and a prefix sum
    over the |days| rollup — cumulative distinct == cumulative new,
    because each user contributes exactly once, on their first day.
    The prefix window runs over the bounded day rollup (grows with
    calendar time, not data rate)."""
    e = _events(spark, sf_dir)
    first_seen = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d")
    )
    daily = first_seen.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("new_users")
    )
    w = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "d",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias(
            "cumulative_users"
        ),
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust trend (round 9): median of pairwise slopes
# ---------------------------------------------------------------------------

# Coarse h1-range buckets for Theil-Sen pair generation: parallelism
# |event_types| x _TS_BUCKETS instead of |event_types| (r9 verdict
# item 2). Purely an execution-shape knob — bucketing never changes
# which pairs are produced.
_TS_BUCKETS = 32


@register(
    "events_theilsen_trend",
    """
    WITH hourly AS (
      SELECT event_type,
             (epoch_ns(ts) // 3600000000000)::BIGINT AS h,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    slopes AS (
      SELECT a.event_type,
             (CAST(b.n AS DOUBLE) - CAST(a.n AS DOUBLE))
               / (CAST(b.h AS DOUBLE) - CAST(a.h AS DOUBLE)) AS slope,
             a.h AS h1, b.h AS h2
      FROM hourly a JOIN hourly b
        ON a.event_type = b.event_type AND a.h < b.h
    ),
    ranked AS (
      SELECT event_type, slope,
             ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY slope, h1, h2) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS cnt
      FROM slopes
    )
    SELECT event_type,
           CAST(MAX(cnt) AS BIGINT) AS n_pairs,
           (MAX(CASE WHEN rn = (cnt + 1) // 2 THEN slope END)
            + MAX(CASE WHEN rn = (cnt + 2) // 2 THEN slope END)) / 2.0
             AS theilsen_slope
    FROM ranked GROUP BY event_type
    """,
)
def events_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of hourly event volume per type: the
    MEDIAN of all pairwise slopes — up to ~29% contamination
    (outliers, incident spikes) cannot move it, unlike OLS, which a
    single bad hour drags arbitrarily. Slopes form per type from the
    HOURLY rollup self-join, so pair volume is C(|hours|, 2) per type
    — bounded by the time range squared, never by event count; the
    per-type median resolves by explicit rank selection (identical
    middle-element arithmetic on both engines — no reliance on either
    engine's median() interpolation), with (h1, h2) tie-breaks making
    the rank order total."""
    from .operators.ranking import with_ordered_prefix

    e = _events(spark, sf_dir)
    hourly = e.groupBy(
        "event_type",
        F.expr("ts_ns div 3600000000000").cast("bigint").alias("h"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))

    # Pair generation, BUCKETED (r9 verdict item 2). A join whose only
    # equi-key is event_type caps parallelism at |event_types| (~5-10)
    # — each type's C(|hours|, 2) pair stream (38 M pairs/type at one
    # year of hourly data) funnels through ONE task chain no matter
    # the cluster size. Instead h1 is bucketed into _TS_BUCKETS coarse
    # ranges of the hour domain and the h2 side is REPLICATED to every
    # bucket at or below its own (monotone bucketing guarantees
    # bkt(h1) <= bkt(h2) whenever h1 < h2, so each qualifying pair is
    # produced exactly once by the (event_type, h1_bkt) equi-join +
    # h1 < h2 residual). Parallelism becomes |types| x _TS_BUCKETS;
    # replication cost is <= _TS_BUCKETS copies of the HOURLY ROLLUP
    # (calendar-bounded), never of the events table. The min/max
    # bounds are one 2-long control-plane aggregate.
    bounds = hourly.agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    ).collect()[0]
    h_lo = int(bounds["lo"]) if bounds["lo"] is not None else 0
    h_hi = int(bounds["hi"]) if bounds["hi"] is not None else 0
    span = max(h_hi - h_lo + 1, 1)
    n_bkts = _TS_BUCKETS

    def bkt(col):
        return F.least(
            F.lit(n_bkts - 1),
            ((col - F.lit(h_lo)) * F.lit(n_bkts)) / F.lit(span),
        ).cast("int")

    a = hourly.select(
        "event_type",
        F.col("h").alias("h1"),
        F.col("n").alias("n1"),
        bkt(F.col("h")).alias("h1_bkt"),
    )
    b = hourly.select(
        F.col("event_type").alias("et2"),
        F.col("h").alias("h2"),
        F.col("n").alias("n2"),
        F.explode(
            F.sequence(F.lit(0), bkt(F.col("h")))
        ).alias("h1_bkt"),
    )
    slopes = a.join(
        b,
        (F.col("event_type") == F.col("et2"))
        & (a["h1_bkt"] == b["h1_bkt"])
        & (F.col("h1") < F.col("h2")),
    ).select(
        "event_type",
        (
            (F.col("n2").cast("double") - F.col("n1").cast("double"))
            / (F.col("h2").cast("double") - F.col("h1").cast("double"))
        ).alias("slope"),
        "h1",
        "h2",
    )
    # Per-type median by exact rank selection over the DISTRIBUTED
    # ordered-prefix pass (never a per-type row_number window — the
    # pair stream per type is the thing whose single-task sort this
    # rewrite removes). The pair stream is persisted first: the pass
    # reads it three times (quantile boundaries, in-bucket rank,
    # carry totals), and regenerating the join per read tripled the
    # cost; unpersisted after the result materializes (the rfm/ccnet
    # pattern).
    slopes = slopes.persist()
    try:
        ranked = with_ordered_prefix(
            slopes,
            "slope",
            [F.col("slope"), F.col("h1"), F.col("h2")],
            {"rn": F.lit(1)},
            partition_cols=["event_type"],
            totals={"cnt": "rn"},
        )
        lo = F.max(
            F.when(
                F.col("rn") == ((F.col("cnt") + 1) / 2).cast("long"),
                F.col("slope"),
            )
        )
        hi = F.max(
            F.when(
                F.col("rn") == ((F.col("cnt") + 2) / 2).cast("long"),
                F.col("slope"),
            )
        )
        res = ranked.groupBy("event_type").agg(
            F.max("cnt").cast("bigint").alias("n_pairs"),
            ((lo + hi) / F.lit(2.0)).alias("theilsen_slope"),
        )
        res = res.persist()
        res.count()
        return res
    finally:
        slopes.unpersist()


# ---------------------------------------------------------------------------
# Round 10: robust median/MAD outlier screen (bucket-locate reuse)
# ---------------------------------------------------------------------------


@register(
    "events_robust_outliers",
    """
    WITH e AS (
      SELECT event_type, event_id,
             CAST(FLOOR(value * 10000) AS BIGINT) AS v_q
      FROM events
    ),
    r1 AS (
      SELECT event_type, v_q,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY v_q, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM e
    ),
    med AS (
      SELECT event_type, MAX(n) AS n,
             MAX(CASE WHEN rn = (n + 1) // 2 THEN v_q END) AS med
      FROM r1 GROUP BY 1
    ),
    d AS (
      SELECT e.event_type, e.event_id, ABS(e.v_q - m.med) AS dev
      FROM e JOIN med m USING (event_type)
    ),
    r2 AS (
      SELECT event_type, dev,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY dev, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM d
    ),
    mad AS (
      SELECT event_type,
             MAX(CASE WHEN rn = (n + 1) // 2 THEN dev END) AS mad
      FROM r2 GROUP BY 1
    )
    SELECT m.event_type,
           CAST(m.n AS BIGINT) AS n_events,
           CAST(m.med AS DOUBLE) / 10000.0 AS median_value,
           CAST(x.mad AS DOUBLE) / 10000.0 AS mad_value,
           CAST(SUM(CASE WHEN ABS(e.v_q - m.med) > 3 * x.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM e JOIN med m USING (event_type) JOIN mad x USING (event_type)
    GROUP BY 1, 2, 3, 4
    """,
)
def events_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD outlier screen per event type — the ROBUST
    counterpart to ``events_anomaly_zscore``: a mean/std gate moves
    with the outliers it's hunting, while the median and the median
    absolute deviation ignore up to half the data being garbage. An
    event is flagged when |x − median| > 3·MAD (unscaled MAD — the
    1.4826 normal-consistency factor is a float constant that adds
    nothing to a threshold rule).

    Fully integer-exact: values quantize to 1e-4 once (floor of one
    IEEE multiply), so both medians are INTEGER order statistics —
    selected via the bucket-locate operator's integer-rank variant
    ((n+1) div 2, the lower median) — and the outlier comparison is
    pure int64. The only floats are the two final /10000 display
    divisions.

    Scale shape: two ``group_rank_statistics`` passes (median, then
    MAD over |x − med|) — each sorts ~1/64 of each type, never a
    whole type in one task — plus one broadcast of the ~|types|-row
    med/mad table and a final map-side-combined count. The events
    projection is persisted across the passes.

    Fixed-overhead trim (round 11, the r10 verdict's heaviest
    extended query): ONE boundary job serves both passes — the
    deviation pass reuses the value boundaries folded around their
    own midpoint (|b − c| for each value boundary b and the middle
    boundary c — bucket boundaries only steer balance, never values,
    so any sorted list is legal); and the ~|types|-row med/mad
    frames are persisted + materialized, so the final join does not
    re-run each locate pipeline's lineage per consumer."""
    from .operators.ranking import (
        group_rank_statistics,
        quantile_boundaries,
    )

    e = _events(spark, sf_dir).select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 10000).cast("bigint").alias("v_q"),
    ).persist()
    med = mad = None
    try:
        lower_median = {"m": lambda n: (n + 1) // 2}
        v_bounds = quantile_boundaries(e, ["v_q"])["v_q"]
        center = v_bounds[len(v_bounds) // 2] if v_bounds else 0.0
        dev_bounds = sorted({abs(b - center) for b in v_bounds})
        med = group_rank_statistics(
            e, "v_q", lower_median, ["event_type"], ["event_id"],
            boundaries=v_bounds,
        ).select(
            "event_type",
            F.col("n").alias("n_events"),
            F.col("value").alias("med"),
        ).persist()
        med.count()
        dev = e.join(F.broadcast(med), "event_type").select(
            "event_type",
            "event_id",
            F.abs(F.col("v_q") - F.col("med")).alias("dev"),
        )
        mad = group_rank_statistics(
            dev, "dev", lower_median, ["event_type"], ["event_id"],
            boundaries=dev_bounds,
        ).select("event_type", F.col("value").alias("mad")).persist()
        stats = med.join(mad, "event_type")
        res = (
            e.join(F.broadcast(stats), "event_type")
            .groupBy("event_type", "n_events", "med", "mad")
            .agg(
                F.sum(
                    F.when(
                        F.abs(F.col("v_q") - F.col("med"))
                        > 3 * F.col("mad"),
                        1,
                    ).otherwise(0)
                )
                .cast("bigint")
                .alias("n_outliers")
            )
            .select(
                "event_type",
                F.col("n_events").cast("bigint").alias("n_events"),
                (F.col("med").cast("double") / F.lit(10000.0)).alias(
                    "median_value"
                ),
                (F.col("mad").cast("double") / F.lit(10000.0)).alias(
                    "mad_value"
                ),
                "n_outliers",
            )
        )
        res = res.persist()
        res.count()
        return res
    finally:
        e.unpersist()
        if med is not None:
            med.unpersist()
        if mad is not None:
            mad.unpersist()


# ---------------------------------------------------------------------------
# Kolmogorov–Smirnov two-sample drift test (round 11)
# ---------------------------------------------------------------------------


@register(
    "events_ks_drift",
    """
    WITH v AS (
      SELECT value,
             SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS a_c,
             SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS b_c
      FROM events WHERE value IS NOT NULL GROUP BY value
    ),
    c AS (
      SELECT SUM(a_c) OVER w AS ca, SUM(b_c) OVER w AS cb
      FROM v WINDOW w AS (
        ORDER BY value
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    n AS (SELECT SUM(a_c) AS n1, SUM(b_c) AS n2 FROM v)
    SELECT CAST(n1 AS BIGINT) AS n_a,
           CAST(n2 AS BIGINT) AS n_b,
           CAST(MAX(ABS(ca * n2 - cb * n1)) AS BIGINT) AS d_num,
           CAST(MAX(ABS(ca * n2 - cb * n1)) AS DOUBLE)
             / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS ks_d
    FROM c, n GROUP BY n1, n2
    """,
)
def events_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between the two
    ingestion shards (event_id parity) over ``value`` — the
    distribution-drift gate a pipeline runs between batches, here as
    an A/A calibration (same-population shards should score near 0,
    so a spike means the sharding itself went biased). The same
    operator shape compares any two cohorts: old batch vs new batch,
    source A vs source B.

    Exactness (the confusable-spam discipline): D = sup|F₁−F₂| is
    evaluated at pooled distinct values with INTEGER cross-
    multiplication — ``d_num = max|c₁·n₂ − c₂·n₁|`` over exact
    bigint cumulative counts, so both engines agree bit-for-bit; the
    reported ``ks_d = d_num / (n₁·n₂)`` is one exact-int double
    division. (int64 holds to ~3·10⁹ rows per shard; past that the
    products move to decimal(38) — SCALING.md.)

    Scale shape: the cumulative counts are the classic ordered-prefix
    problem over a value domain that TRACKS the fact table (doubles,
    mostly distinct) — a single global window would serialize on one
    task, so this runs the engine's distributed ordered-prefix pass
    (quantile buckets → in-bucket running sums → ≤64-row carry):
    one per-value hash-agg, then ``with_ordered_prefix``, then one
    scalar max. No driver-side data, no global sort."""
    from .operators.ranking import with_ordered_prefix

    per_val = (
        _events(spark, sf_dir)
        .where(F.col("value").isNotNull())
        .groupBy("value")
        .agg(
            F.sum(
                F.when(F.col("event_id") % 2 == 0, 1).otherwise(0)
            ).alias("a_c"),
            F.sum(
                F.when(F.col("event_id") % 2 == 1, 1).otherwise(0)
            ).alias("b_c"),
        )
        .persist()
    )
    try:
        ranked = with_ordered_prefix(
            per_val,
            "value",
            [F.col("value")],
            {"ca": F.col("a_c"), "cb": F.col("b_c")},
            totals={"n_a": "ca", "n_b": "cb"},
        )
        res = ranked.agg(
            F.max("n_a").cast("bigint").alias("n_a"),
            F.max("n_b").cast("bigint").alias("n_b"),
            F.max(
                F.abs(
                    F.col("ca") * F.col("n_b")
                    - F.col("cb") * F.col("n_a")
                )
            ).cast("bigint").alias("d_num"),
        ).select(
            "n_a",
            "n_b",
            "d_num",
            (
                F.col("d_num").cast("double")
                / (
                    F.col("n_a").cast("double")
                    * F.col("n_b").cast("double")
                )
            ).alias("ks_d"),
        )
        # degenerate-input row shape: Spark's global agg always emits
        # one row (all NULLs on empty input) while the oracle's
        # GROUP BY n1, n2 emits zero — drop the all-NULL row so both
        # engines return 0 rows when events is empty/all-NULL
        res = res.where(F.col("n_a").isNotNull())
        res = res.persist()
        res.count()
        return res
    finally:
        per_val.unpersist()


# ---------------------------------------------------------------------------
# Classical OLS trend per key (round 11): Theil-Sen's parametric twin
# ---------------------------------------------------------------------------


@register(
    "events_ols_trend",
    """
    WITH hourly AS (
      SELECT event_type,
             (epoch_ns(ts) // 3600000000000)::BIGINT AS h,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    mn AS (SELECT event_type, MIN(h) AS h0 FROM hourly GROUP BY 1),
    pts AS (
      SELECT h.event_type, h.h - m.h0 AS x, h.y AS y
      FROM hourly h JOIN mn m USING (event_type)
    ),
    s AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
      FROM pts GROUP BY 1
    ),
    d AS (
      SELECT event_type, n,
             CAST(n * sxy - sx * sy AS DOUBLE) AS dnum,
             CAST(n * sxx - sx * sx AS DOUBLE) AS dden,
             CAST(n * syy - sy * sy AS DOUBLE) AS dsyy,
             CAST(sx AS DOUBLE) AS dsx,
             CAST(sy AS DOUBLE) AS dsy
      FROM s
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_hours,
           CASE WHEN dden = 0 THEN NULL
                ELSE dnum / dden END AS slope,
           CASE WHEN dden = 0 THEN NULL
                ELSE (dsy - (dnum / dden) * dsx) / CAST(n AS DOUBLE)
                END AS intercept,
           CASE WHEN dden = 0 OR dsyy = 0 THEN NULL
                ELSE (dnum * dnum) / (dden * dsyy) END AS r2
    FROM d
    """,
)
def events_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type least-squares trend of the hourly rate — the
    classical parametric twin of ``events_theilsen_trend``: where
    Theil-Sen pays a pair join for outlier robustness, OLS gets
    slope + intercept + r² from the closed-form normal equations in
    ONE map-side-combined hash-agg over the hourly rollup. A pipeline
    runs both: OLS for every key cheaply, Theil-Sen only on keys
    whose r² and slope disagree (robustness actually needed).

    Exactness: hours are recentered per key (x = h − min(h), so the
    moment sums stay small), all six moments accumulate as EXACT
    integers — DECIMAL(38,0) on Spark, HUGEINT on DuckDB — and every
    reported double is the same fixed expression tree over
    identically-rounded casts of identical integers: one division for
    slope, one fused tree each for intercept and r². Degenerate keys
    (a single distinct hour) return NULL, not a division crash.

    Scale shape: one hourly hash-agg over the fact stream (the only
    data-sized pass), then a |keys|-row min join (broadcast; key
    domain is bounded) and a |keys × hours|-row moment agg. At 100 TB
    nothing but the first rollup touches the fact table."""
    hourly = (
        _events(spark, sf_dir)
        .groupBy(
            "event_type",
            # exact integer division: the float path rounds ts_ns at
            # 2^53, so a timestamp within ~128 ns of an hour boundary
            # could land in a different bucket than the oracle's `//`
            F.expr("ts_ns div 3600000000000").alias("h"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    mn = hourly.groupBy("event_type").agg(F.min("h").alias("h0"))
    pts = hourly.join(F.broadcast(mn), "event_type").select(
        "event_type",
        (F.col("h") - F.col("h0")).cast("decimal(19,0)").alias("x"),
        F.col("y").cast("decimal(19,0)").alias("y"),
    )
    s = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(19,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    d = s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_hours"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("double")
        .alias("dnum"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("double")
        .alias("dden"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("double")
        .alias("dsyy"),
        F.col("sx").cast("double").alias("dsx"),
        F.col("sy").cast("double").alias("dsy"),
    )
    slope = F.col("dnum") / F.col("dden")
    return d.select(
        "event_type",
        "n_hours",
        F.when(F.col("dden") == 0, F.lit(None).cast("double"))
        .otherwise(slope)
        .alias("slope"),
        F.when(F.col("dden") == 0, F.lit(None).cast("double"))
        .otherwise(
            (F.col("dsy") - slope * F.col("dsx"))
            / F.col("n_hours").cast("double")
        )
        .alias("intercept"),
        F.when(
            (F.col("dden") == 0) | (F.col("dsyy") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            (F.col("dnum") * F.col("dnum"))
            / (F.col("dden") * F.col("dsyy"))
        )
        .alias("r2"),
    )


# ---------------------------------------------------------------------------
# Temporal embargo split (round 11, third batch): purged time-series CV
# ---------------------------------------------------------------------------

_EMBARGO_NS = 86_400_000_000_000  # 1 day, both engines


@register(
    "events_embargo_split",
    f"""
    WITH b AS (
      SELECT MIN(epoch_ns(ts)) AS lo, MAX(epoch_ns(ts)) AS hi
      FROM events
    ),
    cut AS (
      SELECT lo, hi, lo + ((hi - lo) * 4) // 5 AS t_cut FROM b
    ),
    lab AS (
      SELECT CASE
               WHEN epoch_ns(ts) <= t_cut THEN 'train'
               WHEN epoch_ns(ts) > t_cut + {_EMBARGO_NS} THEN 'test'
               ELSE 'purged'
             END AS split,
             epoch_ns(ts) AS tns
      FROM events, cut
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(tns) AS BIGINT) AS min_ts_ns,
           CAST(MAX(tns) AS BIGINT) AS max_ts_ns
    FROM lab GROUP BY split
    """,
)
def events_embargo_split(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PURGED temporal train/test split with an embargo window — the
    time-series CV discipline (López de Prado): train = first 80% of
    the observed time range, test = everything after the cut PLUS a
    1-day embargo, and the embargo band itself is PURGED (dropped)
    so that any feature computed over trailing windows in the train
    split cannot overlap the test horizon. The group-based sibling is
    `doc_leakage_free_split` (duplicate clusters); this one closes
    the TEMPORAL leakage channel.

    Exactness: the cut is integer arithmetic on epoch-nanos
    (``lo + (hi − lo)·4 // 5`` — floor division of exact int64s,
    identical on both engines); the embargo is an integer constant;
    every reported column is an exact bigint. No floats anywhere.

    Scale shape: one min/max agg over the stream (map-side combined),
    the 1-row bounds broadcast back, one labeling pass folded into a
    3-row hash-agg. The fact table is scanned twice (bounds + label)
    — the price of a data-driven cut; a production pipeline pins
    t_cut explicitly and scans once."""
    ev = _events(spark, sf_dir)
    b = ev.agg(
        F.min("ts_ns").alias("lo"), F.max("ts_ns").alias("hi")
    ).select(
        "lo",
        "hi",
        (
            F.col("lo")
            + F.expr("((hi - lo) * 4) div 5")
        ).alias("t_cut"),
    )
    lab = ev.crossJoin(F.broadcast(b)).select(
        F.when(F.col("ts_ns") <= F.col("t_cut"), F.lit("train"))
        .when(
            F.col("ts_ns") > F.col("t_cut") + F.lit(_EMBARGO_NS),
            F.lit("test"),
        )
        .otherwise(F.lit("purged"))
        .alias("split"),
        F.col("ts_ns").alias("tns"),
    )
    return lab.groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("tns").cast("bigint").alias("min_ts_ns"),
        F.max("tns").cast("bigint").alias("max_ts_ns"),
    )


# ---------------------------------------------------------------------------
# Difference-in-differences (round 11, third batch): the causal baseline
# ---------------------------------------------------------------------------


@register(
    "events_diff_in_diff",
    """
    WITH b AS (
      SELECT MIN(epoch_ns(ts)) AS lo, MAX(epoch_ns(ts)) AS hi
      FROM events WHERE value IS NOT NULL
    ),
    cut AS (SELECT lo + (hi - lo) // 2 AS t_mid FROM b),
    cells AS (
      SELECT CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS treated,
             CASE WHEN epoch_ns(ts) > t_mid THEN 1 ELSE 0 END
               AS post,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,4))) AS s
      FROM events, cut WHERE value IS NOT NULL
      GROUP BY 1, 2
    ),
    m AS (
      SELECT treated, post, n,
             CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_v
      FROM cells
    )
    SELECT
      CAST(SUM(CASE WHEN treated = 1 AND post = 0 THEN n END)
           AS BIGINT) AS n_treat_pre,
      CAST(SUM(CASE WHEN treated = 1 AND post = 1 THEN n END)
           AS BIGINT) AS n_treat_post,
      CAST(SUM(CASE WHEN treated = 0 AND post = 0 THEN n END)
           AS BIGINT) AS n_ctrl_pre,
      CAST(SUM(CASE WHEN treated = 0 AND post = 1 THEN n END)
           AS BIGINT) AS n_ctrl_post,
      MAX(CASE WHEN treated = 1 AND post = 0 THEN mean_v END)
        AS mean_treat_pre,
      MAX(CASE WHEN treated = 1 AND post = 1 THEN mean_v END)
        AS mean_treat_post,
      MAX(CASE WHEN treated = 0 AND post = 0 THEN mean_v END)
        AS mean_ctrl_pre,
      MAX(CASE WHEN treated = 0 AND post = 1 THEN mean_v END)
        AS mean_ctrl_post,
      (MAX(CASE WHEN treated = 1 AND post = 1 THEN mean_v END)
       - MAX(CASE WHEN treated = 1 AND post = 0 THEN mean_v END))
      - (MAX(CASE WHEN treated = 0 AND post = 1 THEN mean_v END)
         - MAX(CASE WHEN treated = 0 AND post = 0 THEN mean_v END))
        AS did
    FROM m
    """,
)
def events_diff_in_diff(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Difference-in-differences over the event stream — the causal
    baseline an experimentation platform computes in-warehouse:
    treatment = user-id parity (the deterministic assignment an A/B
    platform would replace with its own flags), period = before/after
    the observed time-range midpoint, outcome = the event value. The
    DiD estimate (Δtreated − Δcontrol) nets out both the group's
    level difference and the common time trend; on the parity
    assignment it is an A/A placebo — a non-zero reading calibrates
    the pipeline's noise floor.

    Exactness: the midpoint cut is exact int64 epoch-nanos floor
    arithmetic (the embargo-split discipline); the four cell sums
    accumulate in DECIMAL(18,4); each mean is one exact-int double
    division and the DiD is one fixed subtraction tree over them —
    cross-engine bit-exact.

    Scale shape: one min/max bounds agg, the 1-row cut broadcast
    back, one map-side-combined 4-cell agg, one 1-row pivot. Two
    fact scans (bounds + cells), no window, no join beyond the 1-row
    broadcast."""
    ev = _events(spark, sf_dir).where(F.col("value").isNotNull())
    b = ev.agg(
        F.min("ts_ns").alias("lo"), F.max("ts_ns").alias("hi")
    ).select(
        (F.col("lo") + F.expr("(hi - lo) div 2")).alias("t_mid")
    )
    cells = (
        ev.crossJoin(F.broadcast(b))
        .groupBy(
            (F.col("user_id") % 2 == 1)
            .cast("int")
            .alias("treated"),
            (F.col("ts_ns") > F.col("t_mid")).cast("int").alias(
                "post"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("value")).alias("s"),
        )
        .select(
            "treated",
            "post",
            "n",
            (F.col("s").cast("double") / F.col("n").cast("double"))
            .alias("mean_v"),
        )
    )

    def _cell(t, p, col):
        return F.max(
            F.when(
                (F.col("treated") == t) & (F.col("post") == p),
                F.col(col),
            )
        )

    def _n(t, p):
        return F.sum(
            F.when(
                (F.col("treated") == t) & (F.col("post") == p),
                F.col("n"),
            )
        ).cast("bigint")

    return cells.agg(
        _n(1, 0).alias("n_treat_pre"),
        _n(1, 1).alias("n_treat_post"),
        _n(0, 0).alias("n_ctrl_pre"),
        _n(0, 1).alias("n_ctrl_post"),
        _cell(1, 0, "mean_v").alias("mean_treat_pre"),
        _cell(1, 1, "mean_v").alias("mean_treat_post"),
        _cell(0, 0, "mean_v").alias("mean_ctrl_pre"),
        _cell(0, 1, "mean_v").alias("mean_ctrl_post"),
        (
            (_cell(1, 1, "mean_v") - _cell(1, 0, "mean_v"))
            - (_cell(0, 1, "mean_v") - _cell(0, 0, "mean_v"))
        ).alias("did"),
    )


# ---------------------------------------------------------------------------
# Round 12: rank / trend / control-chart statistics
# ---------------------------------------------------------------------------


@register(
    "events_mannwhitney_drift",
    """
    WITH v AS (
      SELECT value,
             SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS a_c,
             SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS b_c
      FROM events WHERE value IS NOT NULL GROUP BY value
    ),
    r AS (
      SELECT a_c, b_c, a_c + b_c AS t,
             SUM(a_c + b_c) OVER (
               ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ct
      FROM v
    ),
    s AS (
      SELECT CAST(SUM(a_c) AS BIGINT) AS n_a,
             CAST(SUM(b_c) AS BIGINT) AS n_b,
             CAST(SUM(a_c * (2 * (ct - t) + t + 1)) AS BIGINT) AS r2a,
             CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term
      FROM r
    )
    SELECT n_a, n_b,
           r2a - n_a * (n_a + 1) AS u2_a,
           tie_term,
           CASE WHEN n_a > 0 AND n_b > 0 AND n_a + n_b > 1 THEN
             (CAST(r2a - n_a * (n_a + 1) AS DOUBLE)
              - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
             / (2.0 * SQRT(
                 CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
                 * (CAST(n_a + n_b + 1 AS DOUBLE)
                    - CAST(tie_term AS DOUBLE)
                      / (CAST(n_a + n_b AS DOUBLE)
                         * CAST(n_a + n_b - 1 AS DOUBLE)))))
           END AS z
    FROM s WHERE n_a IS NOT NULL
    """,
)
def events_mannwhitney_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact tie-corrected Mann-Whitney U between the two ingestion
    shards (event_id parity) over ``value`` — the rank-based
    location-shift drift gate beside ``events_ks_drift``'s
    shape-shift gate (KS sees any distributional change; U is the
    more powerful test when the worry is a median shift, the typical
    symptom of a biased batch). Same A/A calibration framing.

    Exactness: midranks are carried DOUBLED so everything stays
    integer — per pooled distinct value, shard A's rank contribution
    is ``a_c * (2*cum_before + t + 1)`` over exact bigint cumulative
    counts; ``u2_a = 2*U_A = R2_A - n_a*(n_a+1)`` and the tie term
    ``Σ(t³−t)`` are exact int64 (int64 holds to ~10^6 distinct-value
    multiplicity cubed; a fully-tied 10^9-row column moves the cube
    to decimal(38) — the KS products note, SCALING.md). The z score
    is ONE fixed expression over those integers (+,−,×,÷,sqrt are
    IEEE-exactly-rounded, so both engines agree bitwise).

    Scale shape: identical to ``events_ks_drift`` — one per-value
    hash-agg (the only corpus-sized pass), the distributed
    ordered-prefix pass for the cumulative counts (value domain
    tracks the fact table; no global window), one scalar agg. The
    degenerate-input row-shape rule applies (empty/all-NULL input
    returns 0 rows on both engines)."""
    from .operators.ranking import with_ordered_prefix

    per_val = (
        _events(spark, sf_dir)
        .where(F.col("value").isNotNull())
        .groupBy("value")
        .agg(
            F.sum(
                F.when(F.col("event_id") % 2 == 0, 1).otherwise(0)
            ).alias("a_c"),
            F.sum(
                F.when(F.col("event_id") % 2 == 1, 1).otherwise(0)
            ).alias("b_c"),
        )
        .withColumn("t", F.col("a_c") + F.col("b_c"))
        .persist()
    )
    try:
        ranked = with_ordered_prefix(
            per_val,
            "value",
            [F.col("value")],
            {"ct": F.col("t")},
        )
        s = ranked.agg(
            F.sum("a_c").cast("bigint").alias("n_a"),
            F.sum("b_c").cast("bigint").alias("n_b"),
            F.sum(
                F.col("a_c")
                * (2 * (F.col("ct") - F.col("t")) + F.col("t") + 1)
            ).cast("bigint").alias("r2a"),
            F.sum(
                F.col("t") * F.col("t") * F.col("t") - F.col("t")
            ).cast("bigint").alias("tie_term"),
        )
        n_a, n_b = F.col("n_a"), F.col("n_b")
        nn = n_a + n_b
        u2 = F.col("r2a") - n_a * (n_a + 1)
        var = (
            n_a.cast("double") * n_b.cast("double") / F.lit(12.0)
            * (
                (nn + 1).cast("double")
                - F.col("tie_term").cast("double")
                / (nn.cast("double") * (nn - 1).cast("double"))
            )
        )
        res = s.select(
            "n_a",
            "n_b",
            u2.cast("bigint").alias("u2_a"),
            "tie_term",
            F.when(
                (n_a > 0) & (n_b > 0) & (nn > 1),
                (u2.cast("double") - n_a.cast("double")
                 * n_b.cast("double"))
                / (F.lit(2.0) * F.sqrt(var)),
            ).alias("z"),
        ).where(n_a.isNotNull())
        res = res.persist()
        res.count()
        return res
    finally:
        per_val.unpersist()


@register(
    "events_mann_kendall",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS y
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT a.event_type,
             CAST(SUM(CASE WHEN b.y > a.y THEN 1
                           WHEN b.y < a.y THEN -1 ELSE 0 END)
                  AS BIGINT) AS s_stat
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type AND b.day > a.day
      GROUP BY 1
    ),
    n AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily GROUP BY 1
    ),
    ties AS (
      SELECT event_type,
             CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_adj
      FROM (SELECT event_type, y, COUNT(*) AS t FROM daily
            GROUP BY 1, 2)
      GROUP BY 1
    )
    SELECT n.event_type, n.n_days,
           COALESCE(s.s_stat, 0) AS s_stat,
           n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
             - COALESCE(ties.tie_adj, 0) AS var18_num,
           CASE WHEN n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                     - COALESCE(ties.tie_adj, 0) > 0 THEN
             CAST(COALESCE(s.s_stat, 0)
                  - CASE WHEN COALESCE(s.s_stat, 0) > 0 THEN 1
                         WHEN COALESCE(s.s_stat, 0) < 0 THEN -1
                         ELSE 0 END AS DOUBLE)
             / SQRT(CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                         - COALESCE(ties.tie_adj, 0) AS DOUBLE) / 18.0)
           ELSE 0.0 END AS z
    FROM n LEFT JOIN s ON s.event_type = n.event_type
    LEFT JOIN ties ON ties.event_type = n.event_type
    """,
)
def events_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test over the daily event count per
    type — the NON-parametric twin of ``events_theilsen_trend`` (and
    the test that usually accompanies a Theil-Sen slope estimate):
    S = Σ_{i<j} sign(y_j − y_i) over days, with the tie-corrected
    normal approximation z = (S ∓ 1)/√(Var S). Everything up to the
    final z is exact int64 (S, the ×18 variance numerator, tie
    adjustment); z is one fixed expression.

    Scale shape: the pair sum runs over the DAILY ROLLUP, not events
    — |days|² pairs per type where |days| is calendar-bounded (the
    monthly-momentum class: grows with time, not data rate), so the
    self-join is a per-type broadcast of a days-sized table. The only
    corpus-sized pass is the (type, day) hash-agg. An O(n log n)
    inversion-count formulation exists for key domains that track the
    fact table; the calendar bound makes it unnecessary here."""
    daily = (
        _events(spark, sf_dir)
        .groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        )
        .agg(F.count(F.lit(1)).alias("y"))
        .persist()
    )
    try:
        a = daily.select(
            "event_type",
            F.col("day").alias("da"),
            F.col("y").alias("ya"),
        )
        b = daily.select(
            "event_type",
            F.col("day").alias("db"),
            F.col("y").alias("yb"),
        )
        s = (
            a.join(b, ["event_type"])
            .where(F.col("db") > F.col("da"))
            .groupBy("event_type")
            .agg(
                F.sum(
                    F.when(F.col("yb") > F.col("ya"), 1)
                    .when(F.col("yb") < F.col("ya"), -1)
                    .otherwise(0)
                ).cast("bigint").alias("s_stat")
            )
        )
        n = daily.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days")
        )
        ties = (
            daily.groupBy("event_type", "y")
            .agg(F.count(F.lit(1)).alias("t"))
            .groupBy("event_type")
            .agg(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ).cast("bigint").alias("tie_adj")
            )
        )
        joined = (
            n.join(s, "event_type", "left")
            .join(ties, "event_type", "left")
            .select(
                "event_type",
                "n_days",
                F.coalesce("s_stat", F.lit(0)).alias("s_stat"),
                (
                    F.col("n_days") * (F.col("n_days") - 1)
                    * (2 * F.col("n_days") + 5)
                    - F.coalesce("tie_adj", F.lit(0))
                ).cast("bigint").alias("var18_num"),
            )
        )
        cont = F.col("s_stat") - F.when(F.col("s_stat") > 0, 1).when(
            F.col("s_stat") < 0, -1
        ).otherwise(0)
        res = joined.select(
            "event_type",
            "n_days",
            "s_stat",
            "var18_num",
            F.when(
                F.col("var18_num") > 0,
                cont.cast("double")
                / F.sqrt(F.col("var18_num").cast("double") / F.lit(18.0)),
            ).otherwise(F.lit(0.0)).alias("z"),
        )
        res = res.persist()
        res.count()
        return res
    finally:
        daily.unpersist()


@register(
    "events_cusum_alarm",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(c) AS BIGINT) AS total
      FROM daily GROUP BY 1
    ),
    psum AS (
      SELECT d.event_type, d.day, t.n_days, t.total,
             SUM(t.n_days * d.c - t.total) OVER (
               PARTITION BY d.event_type ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
      FROM daily d JOIN tot t ON t.event_type = d.event_type
    ),
    pre AS (
      SELECT event_type, n_days, total, p,
             LEAST(CAST(0 AS BIGINT), MIN(p) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS m
      FROM psum
    )
    SELECT event_type, n_days,
           CAST(MAX(p - m) AS BIGINT) AS max_cusum,
           CAST(SUM(CASE WHEN p - m > 2 * total THEN 1 ELSE 0 END)
                AS BIGINT) AS n_alarm_days
    FROM pre GROUP BY 1, 2
    """,
)
def events_cusum_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM control chart over the daily event count per
    type — the sequential change detector a monitoring pipeline runs
    next to the retrospective ``events_change_points``: the running
    statistic S_t = max(0, S_{t-1} + x_t) accumulates excess over the
    per-type mean and alarms when it crosses the threshold. The
    max-reset recurrence LOOKS like an irreducible fold, but has the
    classic closed form S_t = P_t − min(0, min_{j≤t} P_j) over the
    plain prefix sums P — so it is pure WINDOW arithmetic (a running
    sum and a running min), no per-group array fold, no lambda. (A
    first cut used a list fold; DuckDB 1.0's lambda ``struct_pack``
    evaluates accumulator fields in place, silently corrupting any
    fold whose later fields read earlier ones — the window form is
    both engine-proof and cheaper.)

    Exactness: deviations are pre-scaled integers
    (``n_days*c_t − total``, so "mean" never becomes a float), the
    prefix sums / minima / S_t are exact int64, and the alarm
    threshold is ``2*total`` (two average days of pure excess, in
    the same scaling).

    Scale shape: the windows run over the per-type DAILY rollup —
    calendar-bounded partitions (monthly-momentum class); the only
    corpus-sized pass is the (type, day) hash-agg."""
    daily = (
        _events(spark, sf_dir)
        .groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("c").cast("bigint").alias("total"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = (
        daily.join(tot, "event_type")
        .withColumn(
            "p",
            F.sum(
                (F.col("n_days") * F.col("c") - F.col("total"))
                .cast("bigint")
            ).over(w),
        )
        .withColumn(
            "m",
            F.least(F.lit(0).cast("bigint"), F.min("p").over(w)),
        )
        .withColumn("s", F.col("p") - F.col("m"))
    )
    return pre.groupBy("event_type", "n_days").agg(
        F.max("s").cast("bigint").alias("max_cusum"),
        F.sum(
            F.when(F.col("s") > 2 * F.col("total"), 1).otherwise(0)
        ).cast("bigint").alias("n_alarm_days"),
    )


@register(
    "events_ewma_baseline",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    folded AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             list_reduce(
               list_prepend(0.0,
                 list_transform(list(struct_pack(d := day, c := c)
                                     ORDER BY day),
                                x -> CAST(x.c AS DOUBLE))),
               (a, x) -> 0.75 * a + 0.25 * x) AS ewma,
             CAST(MAX(CASE WHEN day = md THEN c END) AS BIGINT)
               AS last_count
      FROM (SELECT *, MAX(day) OVER (PARTITION BY event_type) AS md
            FROM daily)
      GROUP BY 1
    )
    SELECT event_type, n_days, ewma, last_count,
           CAST(last_count AS DOUBLE) - ewma AS last_deviation
    FROM folded
    """,
)
def events_ewma_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving-average baseline of the daily
    event count per type (α = 1/4, seeded at 0) — the smoothing prior
    the anomaly screens compare against: CUSUM alarms on accumulated
    excess, the EWMA gives the level it accumulated against, and
    ``last_deviation`` (final day vs the pre-smoothed baseline) is
    the "how unusual was today" number an on-call dashboard shows.

    Determinism: the EWMA recurrence S ← 0.75·S + 0.25·x is a SCALAR
    left fold — both engines fold the day-ordered count list
    strictly left-to-right (Spark ``aggregate``, DuckDB
    ``list_reduce`` with a prepended 0.0 seed) over the same exact
    integer counts, so every intermediate double is the same fixed
    operation sequence (the Kaplan-Meier pinned-fold discipline;
    DuckDB's struct_pack in-place lambda quirk does not apply to
    scalar accumulators).

    Scale shape: the fold runs over the per-type DAILY rollup —
    calendar-bounded (monthly-momentum class), so the collect_list is
    a bounded-group aggregate; the only corpus-sized pass is the
    (type, day) hash-agg."""
    daily = (
        _events(spark, sf_dir)
        .groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    folded = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("day", "c"))
                ),
                lambda st: st["c"].cast("double"),
            ),
            F.lit(0.0),
            lambda a, x: F.lit(0.75) * a + F.lit(0.25) * x,
        ).alias("ewma"),
        F.max_by("c", "day").cast("bigint").alias("last_count"),
    )
    return folded.select(
        "event_type",
        "n_days",
        "ewma",
        "last_count",
        (F.col("last_count").cast("double") - F.col("ewma")).alias(
            "last_deviation"
        ),
    )


_POISSON_SPLIT = "2024-01-16"


@register(
    "events_poisson_rate_shift",
    f"""
    WITH bounds AS (
      SELECT MIN(CAST(ts AS DATE)) AS d0,
             MAX(CAST(ts AS DATE)) AS d1
      FROM events
    ),
    split AS (
      SELECT CAST(date_diff('day', d0, DATE '{_POISSON_SPLIT}')
                  AS BIGINT) AS t1,
             CAST(date_diff('day', DATE '{_POISSON_SPLIT}', d1) + 1
                  AS BIGINT) AS t2
      FROM bounds
    ),
    counts AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN CAST(ts AS DATE)
                           < DATE '{_POISSON_SPLIT}'
                      THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN CAST(ts AS DATE)
                           >= DATE '{_POISSON_SPLIT}'
                      THEN 1 ELSE 0 END) AS BIGINT) AS n2
      FROM events GROUP BY event_type
    )
    SELECT event_type, n1, n2, t1, t2,
           (CAST(n1 AS DOUBLE)
            - CAST(n1 + n2 AS DOUBLE)
              * (CAST(t1 AS DOUBLE) / CAST(t1 + t2 AS DOUBLE)))
           / sqrt(CAST(n1 + n2 AS DOUBLE)
                  * (CAST(t1 AS DOUBLE) / CAST(t1 + t2 AS DOUBLE))
                  * (1.0 - CAST(t1 AS DOUBLE)
                           / CAST(t1 + t2 AS DOUBLE))) AS z,
           abs((CAST(n1 AS DOUBLE)
                - CAST(n1 + n2 AS DOUBLE)
                  * (CAST(t1 AS DOUBLE) / CAST(t1 + t2 AS DOUBLE)))
               / sqrt(CAST(n1 + n2 AS DOUBLE)
                      * (CAST(t1 AS DOUBLE)
                         / CAST(t1 + t2 AS DOUBLE))
                      * (1.0 - CAST(t1 AS DOUBLE)
                               / CAST(t1 + t2 AS DOUBLE)))) > 3.0
             AS shifted
    FROM counts CROSS JOIN split
    WHERE n1 + n2 > 0
    """,
)
def events_poisson_rate_shift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-period Poisson rate-shift test per event type — the
    COUNT-process member of the drift family (KS/Mann-Whitney test
    value distributions, CUSUM tracks a running excess; none answers
    "did the arrival RATE change between period 1 and period 2").
    Uses the conditional/binomial exact form: given N = n1 + n2
    events and exposure split p = t1/(t1+t2) days, under H0 n1 ~
    Binomial(N, p), so z = (n1 − Np) / √(Np(1−p)) — the standard
    two-rate comparison (Przyborowski & Wilenski's conditional test,
    normal approximation). |z| > 3 flags a shifted type.

    Determinism: n1/n2/t1/t2 are exact integers (exposure from the
    data's own date bounds + a literal split date); z is ONE fixed
    double expression over those integers on both engines — single
    rounding per arithmetic op, bit-identical (the cramers_v /
    anova discipline).

    Scale shape: one map-side-combined hash-agg over the stream +
    a 1-row bounds broadcast; output is |event types| rows."""
    e = _events(spark, sf_dir)
    split = F.lit(_POISSON_SPLIT).cast("date")
    day = F.to_date("ts")
    bounds = e.agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    ).select(
        F.datediff(split, F.col("d0")).cast("bigint").alias("t1"),
        (F.datediff(F.col("d1"), split) + 1)
        .cast("bigint")
        .alias("t2"),
    )
    counts = e.groupBy("event_type").agg(
        F.sum(F.when(day < split, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(day >= split, 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
    )
    p = F.col("t1").cast("double") / (
        F.col("t1") + F.col("t2")
    ).cast("double")
    nn = (F.col("n1") + F.col("n2")).cast("double")
    z = (F.col("n1").cast("double") - nn * p) / F.sqrt(
        nn * p * (F.lit(1.0) - p)
    )
    return (
        counts.crossJoin(F.broadcast(bounds))
        .where(F.col("n1") + F.col("n2") > 0)
        .select(
            "event_type",
            "n1",
            "n2",
            "t1",
            "t2",
            z.alias("z"),
            (F.abs(z) > 3.0).alias("shifted"),
        )
    )


@register(
    "events_hourly_concentration",
    """
    WITH hourly AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
             CAST(COUNT(*) AS BIGINT) AS n_h
      FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type, day,
           CAST(SUM(n_h) AS BIGINT) AS n_events,
           CAST(SUM(n_h * n_h) AS DOUBLE)
           / (CAST(SUM(n_h) AS DOUBLE) * CAST(SUM(n_h) AS DOUBLE))
             AS hour_simpson
    FROM hourly GROUP BY 1, 2
    """,
)
def events_hourly_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Within-day temporal concentration per event type: the Simpson
    index Σ(n_h/n)² over the day's 24 hour buckets — 1/24 ≈ 0.042
    for perfectly uniform activity, → 1.0 when a day's events pile
    into one hour. The bot/batch-job signature detector beside the
    value-drift monitors: a type whose hour_simpson jumps is being
    driven by a scheduler, not users, regardless of whether its
    VOLUME changed (which is all ``events_poisson_rate_shift`` sees).
    Deliberately Simpson, not Shannon: Σn_h² and n are exact int64,
    so the index is ONE division of exact integers — no logs, no
    cross-engine ulp surface.

    Scale shape: one (type, day, hour) map-side-combined hash-agg
    over the stream, then a 24×-smaller rollup; output is
    |types|·|days| rows."""
    e = _events(spark, sf_dir)
    hourly = e.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        F.hour("ts").cast("bigint").alias("h"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_h"))
    n = F.sum("n_h").cast("bigint")
    return hourly.groupBy("event_type", "day").agg(
        n.alias("n_events"),
        (
            F.sum(F.col("n_h") * F.col("n_h")).cast("double")
            / (n.cast("double") * n.cast("double"))
        ).alias("hour_simpson"),
    )


_IW_NS = 30 * 60 * 1_000_000_000  # 30-minute incident window, nanos
_IW_THRESH = 100.0


@register(
    "events_incident_window_join",
    f"""
    WITH inc AS (
      SELECT event_id AS incident_id, epoch_ns(ts) AS start_ns,
             epoch_ns(ts) + {_IW_NS} AS end_ns
      FROM events WHERE event_type = 'error' AND value >= {_IW_THRESH}
    ),
    hits AS (
      SELECT i.incident_id,
             COUNT(*) AS n,
             COUNT(DISTINCT e.user_id) AS u,
             SUM(CAST(e.value AS DECIMAL(18,4))) AS sv
      FROM inc i JOIN events e
        ON epoch_ns(e.ts) >= i.start_ns
       AND epoch_ns(e.ts) < i.end_ns
       AND e.event_id <> i.incident_id
      GROUP BY 1
    )
    SELECT i.incident_id,
           CAST(coalesce(h.n, 0) AS BIGINT) AS n_events,
           CAST(coalesce(h.u, 0) AS BIGINT) AS n_users,
           CAST(coalesce(h.sv, 0) AS DOUBLE) AS sum_value
    FROM inc i LEFT JOIN hits h ON h.incident_id = i.incident_id
    """,
)
def events_incident_window_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Interval (range) join, the binned-equi-join way: every
    high-severity error event opens a 30-minute incident window, and
    all other events falling inside any window attach to it (count,
    distinct users, exact value sum — the blast-radius report).

    Scale shape — the reason this is NOT an inequality join on Spark:
    a raw ``ts BETWEEN start AND end`` join plans as
    BroadcastNestedLoopJoin (all-pairs), the classic range-join trap.
    Instead both sides key by a time BIN equal to the window length,
    so a window spans at most TWO bins: incidents explode to their
    ≤2 covering bins (array_distinct keeps it one row when aligned),
    events compute one bin each, the join is a plain shuffle
    EQUI-join on the bin key, and the true interval predicate runs as
    a residual filter on int64 nanos AFTER the hash join. Join budget
    is |incidents| × (events per 2 bins) — linear in each side's
    density with a bounded constant, never |incidents| × |events|.
    Overlapping-window semantics preserved exactly (an event joins
    every window containing it); zero-hit incidents kept by a final
    left join against the incident roster. All time arithmetic in
    ``ts_ns`` int64 nanos (the lossless column `_events` exposes) —
    no float time anywhere."""
    e = _events(spark, sf_dir)
    inc = e.where(
        (F.col("event_type") == "error")
        & (F.col("value") >= F.lit(_IW_THRESH))
    ).select(
        F.col("event_id").alias("incident_id"),
        F.col("ts_ns").alias("start_ns"),
        (F.col("ts_ns") + F.lit(_IW_NS).cast("long")).alias("end_ns"),
    )
    binned_inc = inc.select(
        "incident_id",
        "start_ns",
        "end_ns",
        # integer `div`, never float `/`: epoch-nanos (~1.7e18)
        # exceed double's 2^53 mantissa, so float division can land
        # a bin off at the boundary (the _events ts gotcha)
        F.explode(
            F.array_distinct(
                F.array(
                    F.expr(f"start_ns div {_IW_NS}"),
                    F.expr(f"(end_ns - 1) div {_IW_NS}"),
                )
            )
        ).alias("bin"),
    )
    probe = e.select(
        F.col("event_id").alias("e_id"),
        "user_id",
        F.col("ts_ns").alias("e_ns"),
        _dec("value").alias("v_dec"),
        F.expr(f"ts_ns div {_IW_NS}").alias("bin"),
    )
    hits = (
        binned_inc.join(probe, "bin")
        .where(
            (F.col("e_ns") >= F.col("start_ns"))
            & (F.col("e_ns") < F.col("end_ns"))
            & (F.col("e_id") != F.col("incident_id"))
        )
        .groupBy("incident_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.countDistinct("user_id").cast("bigint").alias("u"),
            F.sum("v_dec").alias("sv"),
        )
    )
    zero = F.lit(0)
    return inc.select("incident_id").join(
        hits, "incident_id", "left"
    ).select(
        "incident_id",
        F.coalesce("n", zero).cast("bigint").alias("n_events"),
        F.coalesce("u", zero).cast("bigint").alias("n_users"),
        F.coalesce(F.col("sv").cast("double"), F.lit(0.0)).alias(
            "sum_value"
        ),
    )


_CP_SCALE = 1_000_000


@register(
    "events_changepoint",
    f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    pre AS (
      SELECT event_type, day, n,
             SUM(n) OVER w AS s1,
             CAST(ROW_NUMBER() OVER w AS BIGINT) AS k,
             SUM(n) OVER (PARTITION BY event_type) AS s,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
               AS kk
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    gains AS (
      SELECT event_type, day,
             (CAST(s1 AS HUGEINT) * (kk - k)
              - CAST(s - s1 AS HUGEINT) * k)
             * (CAST(s1 AS HUGEINT) * (kk - k)
                - CAST(s - s1 AS HUGEINT) * k)
             * {_CP_SCALE} // (k * (kk - k)) AS gain_fp
      FROM pre WHERE k < kk
    )
    SELECT event_type, day AS split_day,
           CAST(gain_fp AS DOUBLE) AS gain_fp
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY gain_fp DESC, day) AS r
      FROM gains
    ) WHERE r = 1
    """,
)
def events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single changepoint per event type (binary segmentation, depth
    1): the split day maximizing the between-segment variance
    reduction of the daily event-count series — the first step of the
    standard binseg changepoint recipe, and the detector that finds
    WHERE a rate shifted after `events_poisson_rate_shift` decides
    THAT it shifted.

    Exactness: for a split after position k (prefix sum S1, totals
    K, S), the variance reduction is (S1·(K−k) − (S−S1)·k)² /
    (k·(K−k)·K) up to the constant K — monotone in gain_fp =
    floor((S1·n2 − S2·n1)² · SCALE / (n1·n2)), which both engines
    compute in exact ≥38-digit integer arithmetic (DECIMAL(38,0) /
    HUGEINT) with ONE floor division — so the argmax (ties to the
    earlier day) is bit-deterministic cross-engine; no float compare
    anywhere near the decision. The reported gain casts to double
    only for output.

    Scale shape: one map-side-combined (type, day) hash-agg over the
    stream, then prefix-sum + argmax windows over the |days|-per-type
    rollup — bounded by calendar time, not data rate (the
    monthly_order_momentum contract)."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    wt = Window.partitionBy("event_type")
    pre = daily.select(
        "event_type",
        "day",
        F.sum("n").over(w).alias("s1"),
        F.row_number().over(w).cast("bigint").alias("k"),
        F.sum("n").over(wt).alias("s"),
        F.count(F.lit(1)).over(wt).cast("bigint").alias("kk"),
    )
    diff_sql = (
        "(CAST(s1 AS DECIMAL(38,0)) * CAST(kk - k AS DECIMAL(38,0))"
        " - CAST(s - s1 AS DECIMAL(38,0)) * CAST(k AS DECIMAL(38,0)))"
    )
    gains = pre.where(F.col("k") < F.col("kk")).select(
        "event_type",
        "day",
        F.expr(
            f"CAST({diff_sql} * {diff_sql} * {_CP_SCALE} AS "
            "DECIMAL(38,0)) div CAST(k * (kk - k) AS DECIMAL(38,0))"
        ).alias("gain_fp"),
    )
    wbest = Window.partitionBy("event_type").orderBy(
        F.col("gain_fp").desc(), F.col("day").asc()
    )
    return (
        gains.withColumn("r", F.row_number().over(wbest))
        .where(F.col("r") == 1)
        .select(
            "event_type",
            F.col("day").alias("split_day"),
            F.col("gain_fp").cast("double").alias("gain_fp"),
        )
    )


_HLL_P = 2_147_483_647  # Mersenne prime 2^31 - 1
_HLL_A1, _HLL_B1 = 48_271, 11
_HLL_A2, _HLL_B2 = 69_621, 7
_HLL_M = 64
_HLL_ALPHA = 0.70927  # alpha_64 = 0.7213 / (1 + 1.079/64)


@register(
    "events_hll_explicit",
    f"""
    WITH users AS (
      SELECT DISTINCT user_id FROM events
    ),
    hashed AS (
      SELECT ({_HLL_A1} * user_id + {_HLL_B1}) % {_HLL_P}
               % {_HLL_M} AS register,
             ({_HLL_A2} * user_id + {_HLL_B2}) % {_HLL_P} AS h2
      FROM users
    ),
    rho AS (
      SELECT register,
             CASE WHEN h2 = 0 THEN 32
                  ELSE 31 - length(bin(h2)) + 1 END AS rho
      FROM hashed
    ),
    regs AS (
      SELECT r.r AS register,
             coalesce(mx.m, 0) AS max_rho
      FROM (SELECT unnest(range(0, {_HLL_M})) AS r) r
      LEFT JOIN (SELECT register, MAX(rho) AS m FROM rho
                 GROUP BY 1) mx
        ON mx.register = r.r
    ),
    summary AS (
      SELECT CAST(SUM(CAST(2 AS HUGEINT)
                      ** CAST(63 - max_rho AS INT)) AS HUGEINT)
               AS sum_fp,
             CAST(SUM(CASE WHEN max_rho = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS v_zero
      FROM regs
    )
    SELECT g.register, CAST(g.max_rho AS BIGINT) AS max_rho,
           CAST({_HLL_ALPHA} * {_HLL_M} * {_HLL_M}
                * {float(2 ** 63)!r} / CAST(s.sum_fp AS DOUBLE)
                AS DOUBLE) AS raw_est,
           s.v_zero,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM users) AS n_exact
    FROM regs g, summary s
    """,
)
def events_hll_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog with EVERY register value-checked — the twin that
    does for ``events_hll_rollup`` (rows-only: Spark's hll_sketch_agg
    register state is engine-private) what the seeded-cell twins did
    for k-means: an EXPLICIT affine-mod-prime double hash splits each
    distinct user into a register index (h1 mod 64) and a rank
    (leading-zero count of h2 over the 31-bit domain, via the
    length-of-binary-string identity both engines share in `bin()`),
    registers take max(rank) — the HLL state IS the 64-row output, so
    register contents, the zero-register count, and the raw harmonic
    estimate are all cross-engine exact. The harmonic sum is computed
    as Σ 2^(63−rho) in DECIMAL(38,0)/HUGEINT (exact integers — a
    float Σ2^−rho would be partition-order-dependent past 53 bits of
    span), with ONE double expression at the end for the estimate;
    the exact distinct count rides along so the query reports its own
    measured error, the Bloom-prefilter discipline. No small-range
    correction (that branch is m·ln(m/V) — a cross-engine log-ulp
    surface); raw estimate only, documented.

    Scale shape: the register build is one hash-agg to 64 rows from a
    distinct-user stream (two-phase, map-side combined); everything
    after is constant-size. Mergeability (union = register-wise max)
    is pytest-pinned; the production rollup entry keeps the real
    sketch machinery."""
    e = _events(spark, sf_dir)
    users = e.select("user_id").distinct()
    hashed = users.select(
        (
            (F.col("user_id") * _HLL_A1 + _HLL_B1) % _HLL_P % _HLL_M
        ).alias("register"),
        ((F.col("user_id") * _HLL_A2 + _HLL_B2) % _HLL_P).alias("h2"),
    )
    rho = hashed.select(
        "register",
        F.when(F.col("h2") == 0, F.lit(32))
        .otherwise(F.lit(31) - F.length(F.bin("h2")) + F.lit(1))
        .alias("rho"),
    )
    maxima = rho.groupBy("register").agg(F.max("rho").alias("m"))
    spark_regs = (
        spark.range(_HLL_M)
        .select(F.col("id").alias("register"))
        .join(maxima, "register", "left")
        .select(
            "register",
            F.coalesce("m", F.lit(0)).cast("bigint").alias("max_rho"),
        )
    )
    summary = spark_regs.agg(
        F.sum(
            F.expr(
                "CAST(POW(2, 63 - max_rho) AS DECIMAL(38,0))"
            )
        ).alias("sum_fp"),
        F.sum(
            F.when(F.col("max_rho") == 0, 1).otherwise(0)
        ).cast("bigint").alias("v_zero"),
    )
    n_exact = users.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact")
    )
    est = (
        F.lit(_HLL_ALPHA)
        * F.lit(_HLL_M)
        * F.lit(_HLL_M)
        * F.lit(float(2 ** 63))
        / F.col("sum_fp").cast("double")
    ).alias("raw_est")
    return (
        spark_regs.crossJoin(F.broadcast(summary))
        .crossJoin(F.broadcast(n_exact))
        .select("register", "max_rho", est, "v_zero", "n_exact")
    )


@register(
    "events_mad_outliers",
    """
    WITH v AS (
      SELECT event_type, event_id,
             CAST(CAST(value AS DECIMAL(18,4)) * 100 AS BIGINT)
               AS v100
      FROM events
    ),
    med AS (
      SELECT event_type, v100 AS med100 FROM (
        SELECT event_type, v100,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY v100, event_id) AS r,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM v
      ) WHERE r = (n + 1) // 2
    ),
    dev AS (
      SELECT v.event_type, v.event_id,
             abs(v.v100 - m.med100) AS ad
      FROM v JOIN med m ON m.event_type = v.event_type
    ),
    mad AS (
      SELECT event_type, ad AS mad100 FROM (
        SELECT event_type, ad,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY ad, event_id) AS r,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM dev
      ) WHERE r = (n + 1) // 2
    )
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(m.med100 AS DOUBLE) / 100 AS median_value,
           CAST(a.mad100 AS DOUBLE) / 100 AS mad_value,
           CAST(SUM(CASE WHEN d.ad > 3 * a.mad100 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d
    JOIN med m ON m.event_type = d.event_type
    JOIN mad a ON a.event_type = d.event_type
    GROUP BY d.event_type, m.med100, a.mad100
    """,
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier screen: median / MAD (median absolute
    deviation) with the |dev| > 3·MAD flag — the
    median-family sibling of the mean/stddev z-score detectors, immune
    to the very outliers it hunts.

    Both order statistics go through the round-11 DISTRIBUTED
    bucket-locate (``ranking.group_rank_statistics``) — NEVER a
    per-type row_number window over the raw stream (event types are
    few but each type's partition is fact-linear; the sort behind a
    rank window on it is the round-8 scale-killer class). The oracle's
    per-type windows are fine for DuckDB at check SF; the Spark plan
    is the one that must scale. Values snap to exact int64 centi-units
    through DECIMAL(18,4)·100 (never float·100 — the double mantissa
    rounds 6.55 to 654.999…), so medians, deviations, and the 3·MAD
    compare are all integer-exact cross-engine; the two divisions to
    report display units happen after every decision."""
    from .operators.ranking import (
        group_rank_statistics,
        quantile_boundaries,
    )

    e = _events(spark, sf_dir)
    v = e.select(
        "event_type",
        "event_id",
        (_dec("value") * 100).cast("bigint").alias("v100"),
    ).persist()
    try:
        # ONE boundary job serves both locate passes (the
        # events_robust_outliers r11 trick, ported here in r14):
        # bucket boundaries only steer balance, never values, so the
        # deviation pass legally reuses the value boundaries folded
        # around their own midpoint — |b − c| is where |x − median|
        # mass lands when the median sits near the middle boundary.
        # Saves one full pass over the deviation stream.
        v_bounds = quantile_boundaries(v, ["v100"])["v100"]
        center = v_bounds[len(v_bounds) // 2] if v_bounds else 0.0
        dev_bounds = sorted({abs(b - center) for b in v_bounds})
        med = (
            group_rank_statistics(
                v,
                "v100",
                {"med": lambda n: (n + 1) // 2},
                ["event_type"],
                ["event_id"],
                boundaries=v_bounds,
            )
            .select(
                "event_type", F.col("value").cast("bigint").alias("med100")
            )
        )
        dev = v.join(med, "event_type").select(
            "event_type",
            "event_id",
            "med100",
            F.abs(F.col("v100") - F.col("med100")).alias("ad"),
        ).persist()
        try:
            mad = (
                group_rank_statistics(
                    dev,
                    "ad",
                    {"mad": lambda n: (n + 1) // 2},
                    ["event_type"],
                    ["event_id"],
                    boundaries=dev_bounds,
                )
                .select(
                    "event_type",
                    F.col("value").cast("bigint").alias("mad100"),
                )
            )
            out = (
                dev.join(mad, "event_type")
                .groupBy("event_type", "med100", "mad100")
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n"),
                    F.sum(
                        F.when(
                            F.col("ad") > 3 * F.col("mad100"), 1
                        ).otherwise(0)
                    )
                    .cast("bigint")
                    .alias("n_outliers"),
                )
                .select(
                    "event_type",
                    "n",
                    (F.col("med100").cast("double") / 100).alias(
                        "median_value"
                    ),
                    (F.col("mad100").cast("double") / 100).alias(
                        "mad_value"
                    ),
                    "n_outliers",
                )
            )
            out = out.persist()
            out.count()
            return out
        finally:
            dev.unpersist()
    finally:
        v.unpersist()


@register(
    "events_type_audience_overlap",
    """
    WITH tu AS (
      SELECT DISTINCT event_type, user_id FROM events
    ),
    sizes AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM tu GROUP BY 1
    ),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM tu a JOIN tu b
        ON b.user_id = a.user_id AND b.event_type > a.event_type
      GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b, i.n_both,
           sa.n AS n_a, sb.n AS n_b,
           CAST(i.n_both AS DOUBLE)
           / CAST(sa.n + sb.n - i.n_both AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.event_type = i.type_a
    JOIN sizes sb ON sb.event_type = i.type_b
    """,
)
def events_type_audience_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairwise audience overlap between event types: |A∩B| via a
    user-key equi-join of the DEDUPLICATED (type, user) table and
    exact Jaccard |A∩B|/|A∪B| per ordered type pair — the
    segment-overlap report behind "do error-prone users also click?".

    Scale shape: the distinct (type, user) projection is the only
    pass over the stream (two-phase hash-agg); the pair join is
    user-key equi co-partitioned — its volume is Σ_u deg(u)² with
    deg(u) ≤ |types|, a BOUNDED category domain, so the join budget
    is ≤ |types|²/2 rows per user, never user-quadratic. All counts
    exact integers; Jaccard is one double division (identical
    operand order both engines)."""
    e = _events(spark, sf_dir)
    tu = e.select("event_type", "user_id").distinct()
    sizes = tu.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    a = tu.select(
        F.col("event_type").alias("type_a"), "user_id"
    )
    b = tu.select(
        F.col("event_type").alias("type_b"), "user_id"
    )
    inter = (
        a.join(b, "user_id")
        .where(F.col("type_b") > F.col("type_a"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    sa = sizes.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("n_a")
    )
    sb = sizes.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("n_b")
    )
    return (
        inter.join(sa, "type_a")
        .join(sb, "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            (
                F.col("n_both").cast("double")
                / (
                    F.col("n_a") + F.col("n_b") - F.col("n_both")
                ).cast("double")
            ).alias("jaccard"),
        )
    )
