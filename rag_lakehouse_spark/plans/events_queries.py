"""Event-stream operators, batch-checkable subset (SURVEY.md §2.10).

The reference pipeline is batch-only (manually triggered DAG,
reference dags/books_scraping_dag.py:31); the engine adds the
event-time surface a stream table needs: tumbling windows,
sessionization, event dedup, JSON prop extraction. Each query here has
exact batch semantics (DuckDB-oracle-able); the Structured Streaming
wrappers over the same logic live in ``rag_lakehouse_spark.streaming``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from rag_lakehouse_spark.plans.registry import register
from rag_lakehouse_spark.sources.tables import load_table


@register(
    "events_tumbling_hourly",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("events", "window-agg"),
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (batch form of the streaming
    ``window(ts, '1 hour')`` group — same buckets, expressed as
    date_trunc so the oracle aligns).

    Scale: two-phase hash agg; shuffles only (hour, type) partials.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
    )


@register(
    "events_sessionize",
    oracle="""
    WITH gaps AS (
      SELECT user_id, event_id, ts,
             date_diff('second',
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                       ts) AS gap_s
      FROM events
    ),
    marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END AS is_new
      FROM gaps
    ),
    sessions AS (
      SELECT user_id, event_id, ts,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_no
      FROM marked
    )
    SELECT user_id, session_no,
           COUNT(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           date_diff('second', MIN(ts), MAX(ts)) AS duration_s
    FROM sessions
    GROUP BY user_id, session_no
    """,
    tags=("events", "session", "window"),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap): lag → gap flag → running
    sum as session id → per-session rollup.

    This is the batch equivalent of streaming ``session_window(ts,
    '30 minutes')``. Scale: a single shuffle on user_id serves both
    window passes and the final agg (same partitioning reused).
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    marked = e.withColumn(
        "is_new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    sessions = marked.withColumn(
        "session_no",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return sessions.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias("duration_s"),
    )


@register(
    "events_session_window_builtin",
    oracle="""
    WITH gaps AS (
      SELECT user_id, event_id, ts,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN gap_us IS NULL OR gap_us >= 1800000000 THEN 1 ELSE 0 END AS is_new
      FROM gaps
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM marked
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, sid
    """,
    tags=("events", "session", "builtin"),
)
def events_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in ``session_window`` (batch mode), differentially
    checked against the first-principles gap definition (new session
    when the exact microsecond gap >= 30 min) — verifying the built-in
    operator's merge semantics, not just our own reimplementation."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


@register(
    "events_json_props",
    oracle="""
    WITH j AS (
      -- json_valid guard: DuckDB's json_extract RAISES on malformed
      -- JSON where Spark's get_json_object returns NULL (generated-
      -- events fuzz, props='not json'); the guard makes the oracle
      -- total without changing its value on valid JSON
      SELECT event_type,
             CASE WHEN props IS NOT NULL AND json_valid(props)
                  THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
             END AS k
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(k) AS DOUBLE) / COUNT(k) AS avg_k,
           MAX(k) AS max_k
    FROM j
    GROUP BY event_type
    """,
    tags=("events", "json"),
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: JSON string column → typed field →
    aggregate. ``get_json_object`` stays JVM-side (no UDF); integer sum
    is exact so the avg divides identically in both engines."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("k").cast("double") / F.count("k")).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "events_dedup_first",
    oracle="""
    SELECT user_id, event_type, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts
    FROM (
      SELECT user_id, event_type, event_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events) t
    WHERE rn = 1
    """,
    tags=("events", "dedup"),
)
def events_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping the earliest record — deterministic
    ``dropDuplicates(["user_id","event_type"])`` (dropDuplicates itself
    keeps an arbitrary row; a window makes the choice reproducible).
    Batch form of streaming ``dropDuplicatesWithinWatermark``."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        )
    )


@register(
    "events_hour_profile",
    oracle="""
    SELECT hour(ts) AS hour_of_day,
           minute(ts) // 15 AS quarter_slot,
           COUNT(*) AS n_events,
           COUNT(*) FILTER (WHERE second(ts) < 30) AS first_half_minute
    FROM events
    GROUP BY 1, 2
    """,
    tags=("events", "date"),
)
def events_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-of-day profile: hour/minute/second component extraction."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.hour("ts").alias("hour_of_day"),
        F.floor(F.minute("ts") / 15).alias("quarter_slot"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.second("ts") < 30, 1)).alias("first_half_minute"),
    )


@register(
    "events_user_activity",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(DISTINCT event_type) AS n_types,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(12,2)))
                FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase_value,
           date_diff('second', MIN(ts), MAX(ts)) AS active_span_s
    FROM events
    GROUP BY user_id
    """,
    tags=("events", "agg"),
)
def events_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity profile with conditional (FILTER) aggregates."""
    e = load_table(spark, sf_dir, "events")
    is_purchase = F.col("event_type") == "purchase"
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        F.count(F.when(is_purchase, 1)).alias("n_purchases"),
        F.sum(F.when(is_purchase, F.col("value").cast("decimal(12,2)")))
        .cast("double")
        .alias("purchase_value"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias("active_span_s"),
    )


@register(
    "events_click_purchase_funnel",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           date_diff('second', c.ts, p.ts) AS secs_to_purchase,
           p.value AS purchase_value
    FROM events c
    JOIN events p
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase'
     AND c.event_type = 'click'
     AND p.ts > c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
    tags=("events", "funnel", "interval-join"),
)
def events_click_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase attribution funnel: every purchase within 30
    minutes after a click by the same user (interval equi+range join).
    Batch twin of streaming.click_purchase_stream_join — the streaming
    side is agreement-tested against exactly this plan.

    Scale: equi-join on user_id carries the range predicate; one
    shuffle, range filter evaluated post-match (no cross product)."""
    e = load_table(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return (
        c.join(
            p,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") > F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 30 minutes")
            ),
        )
        .select(
            "user_id",
            "click_id",
            "purchase_id",
            (
                F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")
            ).alias("secs_to_purchase"),
            "purchase_value",
        )
    )


@register(
    "events_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
      FROM events WHERE user_id IS NOT NULL GROUP BY 1
    ), activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS week
      FROM events WHERE user_id IS NOT NULL
    )
    SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('week', f.cohort_week, a.week) AS BIGINT) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM activity a JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    """,
    tags=("events", "cohort", "retention", "analytics"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week, and
    for each later week the count still active — the triangle matrix
    every growth/engagement dashboard is built on. Counting distinct
    (user, week) activity first makes a user count once per week
    however many events they fired.

    Exactness: week buckets are date_trunc('week') on BOTH engines
    (ISO Monday start in both); the offset is an integer week
    difference of already-truncated instants, so no calendar ulp
    surface. Output cohort week as a formatted string per the standing
    string-timestamp rule.

    Scale: one distinct-(user, week) aggregate (map-side combined),
    one per-user MIN, one equi-join on user_id (AQE-skew-safe), one
    final count — shuffle keys are ids and week instants, never raw
    events past the first aggregate."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    firsts = e.groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    joined = activity.join(firsts, "user_id")
    return joined.groupBy(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        (
            F.datediff(F.col("week").cast("date"), F.col("cohort_week").cast("date"))
            / 7
        ).cast("bigint").alias("week_offset"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))


@register(
    "events_active_users_rolling",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events WHERE user_id IS NOT NULL
    ), bounds AS (
      SELECT MIN(d) AS mind, MAX(d) AS maxd FROM act
    ), spine AS (
      SELECT unnest(generate_series(mind, maxd, INTERVAL 1 DAY))::DATE AS day
      FROM bounds
    ), dau AS (
      SELECT d AS day, CAST(COUNT(*) AS BIGINT) AS dau FROM act GROUP BY 1
    ), wau AS (
      SELECT od AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
      FROM (SELECT user_id,
                   unnest(generate_series(d, least(d + INTERVAL 6 DAY,
                                                   (SELECT maxd FROM bounds)),
                                          INTERVAL 1 DAY))::DATE AS od
            FROM act)
      GROUP BY 1
    ), mau AS (
      SELECT od AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
      FROM (SELECT user_id,
                   unnest(generate_series(d, least(d + INTERVAL 29 DAY,
                                                   (SELECT maxd FROM bounds)),
                                          INTERVAL 1 DAY))::DATE AS od
            FROM act)
      GROUP BY 1
    )
    SELECT strftime(spine.day, '%Y-%m-%d') AS day,
           COALESCE(dau.dau, 0) AS dau,
           COALESCE(wau.wau, 0) AS wau,
           COALESCE(mau.mau, 0) AS mau
    FROM spine
    LEFT JOIN dau USING (day)
    LEFT JOIN wau USING (day)
    LEFT JOIN mau USING (day)
    """,
    tags=("events", "engagement", "rolling-distinct", "analytics"),
)
def events_active_users_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / MAU: distinct active users per day and per trailing
    7- and 30-day windows over the dense day spine — the canonical
    engagement rollup. Rolling DISTINCT counts cannot reuse window
    partials (distinct is not additive), so each activity day is
    EXPLODED into the windows it serves (a calendar-bounded ×7 / ×30
    fan-out of the already-collapsed (user, day) table, never of raw
    events) and each window counts distinct users independently —
    exact, shuffle keyed on (window-day, user).

    Scale: the corpus-sized stage is the one distinct-(user, day)
    aggregate; everything after is bounded by users × days × 37. The
    HLL-sketch variant for non-exact dashboards is the standing
    ``events_rollup_distinct_sketch`` path.

    Spine rule: days with no activity report 0 (dense
    min→max sequence from a broadcast 1-row bounds aggregate — the
    gapfill pattern)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    act = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
    ).distinct()
    return rolling_active_users(act)


def rolling_active_users(act: "DataFrame") -> "DataFrame":
    """(day, dau, wau, mau) from a distinct (user_id, d) activity
    relation — the shared serving computation for the batch query
    above and the streaming-maintained twin below."""
    act = act.localCheckpoint(eager=True)  # feeds 4 consumers below
    bounds = act.agg(F.min("d").alias("mind"), F.max("d").alias("maxd"))
    spine = bounds.select(
        F.explode(
            F.expr("sequence(mind, maxd, interval 1 day)")
        ).alias("day")
    )
    dau = act.groupBy(F.col("d").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("dau")
    )

    def rolling(n_days: int, out: str):
        return (
            act.crossJoin(F.broadcast(bounds))
            .select(
                "user_id",
                F.explode(
                    F.expr(
                        f"sequence(d, least(date_add(d, {n_days - 1}), maxd), "
                        "interval 1 day)"
                    )
                ).alias("day"),
            )
            .groupBy("day")
            .agg(F.countDistinct("user_id").cast("bigint").alias(out))
        )

    return (
        spine.join(dau, "day", "left")
        .join(rolling(7, "wau"), "day", "left")
        .join(rolling(30, "mau"), "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("dau", F.lit(0)).cast("bigint").alias("dau"),
            F.coalesce("wau", F.lit(0)).cast("bigint").alias("wau"),
            F.coalesce("mau", F.lit(0)).cast("bigint").alias("mau"),
        )
    )


@register(
    "events_inter_arrival_stats",
    oracle="""
    WITH seq AS (
      SELECT event_type, epoch_us(ts) AS us,
             LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_us
      FROM events WHERE user_id IS NOT NULL
    ), gaps AS (
      SELECT event_type, (next_us - us) // 60000000 AS gap_min
      FROM seq WHERE next_us IS NOT NULL
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           quantile_cont(gap_min, 0.5) AS p50_min,
           quantile_cont(gap_min, 0.9) AS p90_min,
           CAST(MAX(gap_min) AS BIGINT) AS max_min
    FROM gaps GROUP BY event_type
    """,
    tags=("events", "engagement", "latency", "window"),
)
def events_inter_arrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-next-action per event type: for each event, the gap to
    the SAME USER's next event (any type), aggregated per type of the
    earlier event — the engagement-latency profile ("how long after a
    click does the user act again?") behind session-timeout tuning and
    nudge scheduling.

    Exactness: gaps are exact integer microsecond differences
    (``unix_micros`` == ``epoch_us``) floor-divided to MINUTES, which
    also bounds the exact-percentile buffer by the retention window in
    minutes (the r8 bounded-domain percentile rule); the lead window
    orders by (ts, event_id) so same-instant ties are deterministic —
    the standing unique-tiebreaker rule.

    Scale: per-user windows are bounded by a user's own event count
    (the sessionize precedent); the percentile aggregate is per-type
    over the bounded minute grid."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
        F.lead(F.unix_micros(F.col("ts"))).over(w).alias("next_us"),
    )
    gaps = seq.filter(F.col("next_us").isNotNull()).select(
        "event_type",
        F.expr("(next_us - us) DIV 60000000").alias("gap_min"),
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.percentile("gap_min", 0.5).alias("p50_min"),
        F.percentile("gap_min", 0.9).alias("p90_min"),
        F.max("gap_min").cast("bigint").alias("max_min"),
    )


from rag_lakehouse_spark.plans.registry import QUERIES as _Q


@register(
    "events_active_users_incremental",
    oracle=None,  # set below: shares the batch rolling-active oracle
    tags=("events", "engagement", "rolling-distinct", "streaming"),
)
def events_active_users_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU/MAU served from a STREAMING-maintained user-activity
    state, hash-checked against the SAME oracle as the batch
    ``events_active_users_rolling``: events replay through an
    availableNow file stream (4 files ⇒ ≥4 micro-batches folding
    distinct (user, day) pairs into the versioned state via
    ``streaming.rollup_sink.maintain_user_activity``), then the SAME
    ``rolling_active_users`` computation runs over the state. Set
    union is idempotent and mergeable, so batch boundaries — and even
    replayed batches — cannot move any engagement number.

    The pattern completes the incremental-index family for
    engagement: one maintained state (users × active days), per-
    increment cost of one micro-batch, every derived metric exact over
    full history with no event rescan."""
    import os
    import shutil
    import tempfile

    from rag_lakehouse_spark.streaming.rollup_sink import (
        maintain_user_activity,
        read_state,
    )

    base = tempfile.mkdtemp(prefix="rls_active_stream_")
    try:
        src = os.path.join(base, "events")
        (
            load_table(spark, sf_dir, "events")
            .select("user_id", "ts")
            .repartition(4)
            .write.mode("overwrite")
            .parquet(src)
        )
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(base, "user_activity")
        maintain_user_activity(spark, stream, state).awaitTermination()
        act = read_state(spark, state).drop("last_batch_id", "ckpt_id")
        return rolling_active_users(act).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# The incremental path must satisfy the IDENTICAL oracle as the batch
# rolling-active query — that equality is the whole claim.
_Q["events_active_users_incremental"].oracle = _Q[
    "events_active_users_rolling"
].oracle


@register(
    "events_error_rate_daily",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS k
      FROM events GROUP BY 1
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, n AS n_events, k AS n_errors,
           CAST(k AS DOUBLE) / n AS error_rate,
           (CAST(k AS DOUBLE) / n + 1.920929 / n
            - 1.959964 * sqrt((CAST(k AS DOUBLE) / n)
                              * (1 - CAST(k AS DOUBLE) / n) / n
                              + 0.960464 / (n * CAST(n AS DOUBLE))))
           / (1 + 3.841859 / n) AS wilson_lower
    FROM daily
    """,
    tags=("events", "reliability", "monitoring"),
)
def events_error_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily error share with its Wilson-score 95% LOWER bound — the
    reliability monitor that alerts on the bound, not the point rate,
    so one error in ten events on a quiet day doesn't page anyone
    while a sustained 2% at volume does.

    Exactness: counts are integers; the Wilson formula is evaluated
    with FIXED double literals for z = 1.959964 (z²/2 = 1.920929,
    z² = 3.841859, z²/4 = 0.960464) in an identical operation order
    on both engines — deterministic doubles from exact integer inputs,
    same contract as the KS/correlation ratio forms.

    Scale: one daily conditional aggregate — map-side combined, one
    row per day."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", F.col("ts")).alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("k"),
    )
    n = F.col("n")
    p = F.col("k").cast("double") / n
    wilson = (
        p
        + F.lit(1.920929) / n
        - F.lit(1.959964)
        * F.sqrt(p * (F.lit(1.0) - p) / n + F.lit(0.960464) / (n * n.cast("double")))
    ) / (F.lit(1.0) + F.lit(3.841859) / n)
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        n.alias("n_events"),
        F.col("k").alias("n_errors"),
        p.alias("error_rate"),
        wilson.alias("wilson_lower"),
    )


@register(
    "events_cohort_churn",
    oracle="""
    WITH act AS (
      SELECT user_id,
             MIN(date_trunc('week', ts)) AS cohort_week,
             MAX(CAST(date_trunc('day', ts) AS DATE)) AS last_day
      FROM events WHERE user_id IS NOT NULL GROUP BY 1
    ), bounds AS (
      SELECT MAX(CAST(date_trunc('day', ts) AS DATE)) AS maxd FROM events
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN date_diff('day', last_day, bounds.maxd) > 14
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
           CAST(SUM(CASE WHEN date_diff('day', last_day, bounds.maxd) > 14
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS churn_rate
    FROM act, bounds
    GROUP BY 1
    """,
    tags=("events", "cohort", "churn", "analytics"),
)
def events_cohort_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn by acquisition cohort: per first-seen week, how many
    users' LAST activity is more than 14 days before the corpus end —
    the retention triangle's complement (which cohorts leak) and the
    number a lifecycle team actually budgets against.

    Exactness: cohort and last-activity instants are engine-identical
    truncations; the churn gate is an integer day difference against
    the broadcast corpus max-day; the rate is one double division of
    exact counts.

    Scale: one per-user aggregate (map-side combined), a 1-row bound
    broadcast, a per-cohort rollup — |weeks| output rows, no
    windows."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    act = e.groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).alias("cohort_week"),
        F.max(F.date_trunc("day", F.col("ts")).cast("date")).alias("last_day"),
    )
    bounds = load_table(spark, sf_dir, "events").agg(
        F.max(F.date_trunc("day", F.col("ts")).cast("date")).alias("maxd")
    )
    j = act.crossJoin(F.broadcast(bounds))
    churned = F.when(
        F.datediff(F.col("maxd"), F.col("last_day")) > 14, 1
    ).otherwise(0)
    return j.groupBy(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(churned).cast("bigint").alias("n_churned"),
        (F.sum(churned).cast("double") / F.count(F.lit(1))).alias("churn_rate"),
    )


@register(
    "events_decayed_engagement",
    oracle="""
    WITH mx AS (SELECT MAX(ts) AS ref FROM events),
    aged AS (
      SELECT user_id,
             least((epoch_us(mx.ref) - epoch_us(ts)) // 86400000000, 40)
               AS age_d
      FROM events CROSS JOIN mx WHERE user_id IS NOT NULL
    ), scored AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(1 AS BIGINT) << CAST(40 - age_d AS INT))
                  AS BIGINT) AS score_q
      FROM aged GROUP BY user_id
    )
    SELECT user_id, n_events, score_q,
           CAST(score_q AS DOUBLE) / 1099511627776e0 AS decayed_score
    FROM scored
    ORDER BY score_q DESC, user_id ASC
    LIMIT 20
    """,
    tags=("events", "agg", "decay", "training-data"),
)
def events_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decay engagement counters — the leaderboard
    primitive streaming analytics actually serves (recent activity
    counts more) made EXACT: each event contributes 2^-age_days
    (half-life = one day, ages clamped at 40 — contributions below
    2^-40 round to the fixed-point floor), summed per user in 2^-40
    FIXED POINT (each weight is the exact integer
    ``1 << (40 - age)``, so the sum is order-free int64 — the
    quantize-the-INPUT rule applied to decay weights, which are
    dyadic and therefore exact rather than approximated). Top-20
    users by (decayed score, user_id); the one double is a final
    power-of-two division (exact).

    Scale: one scan, one broadcast max-timestamp, per-user partial
    sums with map-side combine, TakeOrderedAndProject for the
    leaderboard. Decayed sums are MERGEABLE (they are plain integer
    sums under a FIXED reference time), so the same fold serves a
    streaming state or rollup — re-referencing to a newer 'now' is a
    single global shift right by the elapsed days, which is why
    production decayed counters store fixed-point integers exactly
    like this.

    Overflow bound (r12): each age-0 event contributes 2^40, so a
    single user needs > 2^23 (~8.4M) events ON THE MAX-ts DAY (or the
    weighted equivalent across days) before score_q can exceed int64 —
    beyond any per-user event rate this table models. Deployments with
    hotter keys should lower the fixed-point scale (e.g. 2^-30 →
    ~8.6B events/user/day headroom) or pre-aggregate counts per
    (user, age_d) and range-check ``cnt <= (2^63-1) >> (40-age_d)``
    before the shift; the scale constant is the only knob."""
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("ref"))
    # integer day age, clamped at 40
    aged = (
        ev.filter(F.col("user_id").isNotNull())
        .crossJoin(F.broadcast(mx))
        .select(
            "user_id",
            F.least(
                F.expr(
                    "CAST((unix_micros(ref) - unix_micros(ts))"
                    " DIV 86400000000 AS BIGINT)"
                ),
                F.lit(40).cast("bigint"),
            ).alias("age_d"),
        )
    )
    scored = aged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(40 - age_d AS INT))"))
        .cast("bigint")
        .alias("score_q"),
    )
    return (
        scored.select(
            "user_id",
            "n_events",
            "score_q",
            (F.col("score_q").cast("double") / F.lit(float(1 << 40))).alias(
                "decayed_score"
            ),
        )
        .orderBy(F.desc("score_q"), F.asc("user_id"))
        .limit(20)
    )
