"""Time-series operators over the events table: bucketed range join
and hypertable-style multi-resolution rollup (SURVEY.md §2.10 family;
the reference has no time-series surface, these are the engine-side
operators a stream table needs at rest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rag_lakehouse_spark.operators.range_join import bucketed_range_join, epoch_micros
from rag_lakehouse_spark.operators.rollup import time_rollup
from rag_lakehouse_spark.plans.registry import register
from rag_lakehouse_spark.sources.tables import load_table

_TEN_MIN_US = 600 * 1_000_000


@register(
    "events_incident_window_join",
    oracle="""
    WITH win AS (
      SELECT event_id AS window_id, date_trunc('second', ts) AS w_start,
             date_trunc('second', ts) + INTERVAL 10 MINUTE AS w_end
      FROM events WHERE event_type = 'purchase' AND value > 200
    )
    SELECT window_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events e
    JOIN win ON date_trunc('second', e.ts) >= w_start
            AND date_trunc('second', e.ts) < w_end
    GROUP BY window_id
    """,
    tags=("events", "range-join"),
)
def events_incident_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless point-in-interval join at scale: high-value purchases
    open 10-minute incident windows; count/sum ALL events (any user)
    inside each window. No equality key exists, so the naive plan is a
    nested-loop/cartesian — the bucketed range join quantizes time
    into 10-minute buckets, explodes each window to its ≤2 buckets,
    and hash-joins on bucket id with the exact range as a residual.

    Timestamps are second-truncated on BOTH sides before comparing so
    the parquet ns-vs-µs physical difference between engines cannot
    shift a boundary row.

    Scale: shuffle is hash-partitioned on time bucket — linear, no
    broadcast dependence; bursty buckets split via AQE skew join."""
    e = load_table(spark, sf_dir, "events")
    ts_s = epoch_micros(F.date_trunc("second", F.col("ts")))
    wins = (
        e.filter((F.col("event_type") == "purchase") & (F.col("value") > 200))
        .select(
            F.col("event_id").alias("window_id"),
            ts_s.alias("w_start"),
            (ts_s + F.lit(_TEN_MIN_US)).alias("w_end"),
        )
    )
    points = e.select(ts_s.alias("ts_us"), F.col("value").alias("ev_value"))
    joined = bucketed_range_join(
        points, wins, "ts_us", "w_start", "w_end", bucket_width=_TEN_MIN_US
    )
    return joined.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("ev_value").cast("decimal(12,2)")).cast("double").alias("total_value"),
    )


@register(
    "events_hypertable_rollup",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS b, COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(12,2))) AS v
      FROM events GROUP BY 1
    ), daily AS (
      SELECT date_trunc('day', b) AS b, CAST(SUM(n) AS BIGINT) AS n, SUM(v) AS v
      FROM hourly GROUP BY 1
    ), monthly AS (
      SELECT date_trunc('month', b) AS b, CAST(SUM(n) AS BIGINT) AS n, SUM(v) AS v
      FROM daily GROUP BY 1
    )
    SELECT 'hour' AS grain, strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_start,
           n AS n_events, CAST(v AS DOUBLE) AS total_value FROM hourly
    UNION ALL
    SELECT 'day', strftime(b, '%Y-%m-%d %H:%M:%S'), n, CAST(v AS DOUBLE) FROM daily
    UNION ALL
    SELECT 'month', strftime(b, '%Y-%m-%d %H:%M:%S'), n, CAST(v AS DOUBLE) FROM monthly
    """,
    tags=("events", "rollup", "timeseries"),
)
def events_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate hierarchy: hour/day/month event counts and
    value totals where each coarser grain RE-AGGREGATES the finer
    grain's partials (count→sum, decimal sum→sum) instead of
    re-scanning the raw table — the oracle mirrors the same cascade.

    Scale: one raw scan + one shuffle build the hour grain; day and
    month work on thousands of partial rows. This is the batch twin of
    maintaining rollup tables under a streaming sink."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "__v", F.col("value").cast("decimal(12,2)")
    )
    rolled = time_rollup(
        e.select("ts", "__v"),
        "ts",
        measures={"n_events": ("count", "__v"), "total_value": ("sum", "__v")},
        grains=("hour", "day", "month"),
    )
    return rolled.select(
        "grain",
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        "n_events",
        F.col("total_value").cast("double").alias("total_value"),
    )


@register(
    "events_rollup_hour_only",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1
    """,
    tags=("events", "rollup", "streaming"),
)
def events_rollup_hour_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING-maintained hour grain, hash-checked against the
    batch oracle: events replay through an availableNow file stream
    (maxFilesPerTrigger=1 over a 4-file copy, so ≥4 micro-batches each
    fold into the stored partial table via
    ``streaming.rollup_sink.maintain_hourly_rollup``), then the state
    table is read back as a batch DataFrame. Because every maintained
    measure is mergeable (count/decimal-sum add, the HLL sketch unions),
    batch boundaries cannot change the result — the incremental fold
    must equal the one-shot GROUP BY the oracle runs. This turns the
    sink's pytest-only evidence into a driver row.

    Scale: each micro-batch touches its own rows plus the partial table
    (buckets × groups, thousands of rows); raw history is never
    re-scanned. Serving reads are a scan of the tiny state table."""
    import os
    import shutil
    import tempfile

    from rag_lakehouse_spark.streaming.rollup_sink import (
        maintain_hourly_rollup,
        read_state,
    )

    # Per-invocation private temp dir: a stale checkpoint would treat
    # rewritten source files as new and re-fold them onto old state,
    # and a DETERMINISTIC dir rmtree'd at entry races concurrent
    # invocations (two sessions deleting each other's live state).
    # mkdtemp gives each invocation its own namespace; the dir (a full
    # events copy + checkpoint + state — tens of MB at sf0.1) is
    # rmtree'd below once the tiny hour-grain result is materialized.
    base = tempfile.mkdtemp(prefix="rls_rollup_stream_")
    try:
        src = os.path.join(base, "events")
        (
            load_table(spark, sf_dir, "events")
            .select("ts", "user_id", "value")
            .repartition(4)
            .write.mode("overwrite")
            .parquet(src)
        )
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(base, "hourly")
        maintain_hourly_rollup(spark, stream, state).awaitTermination()
        # eager checkpoint (buckets × groups rows) detaches the result
        # from the temp parquet so the dir can be deleted immediately
        return read_state(spark, state).select(
            F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("total_value").cast("double").alias("total_value"),
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register("events_rollup_distinct_sketch", oracle=None, tags=("events", "rollup", "sketch"))
def events_rollup_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rollup hierarchy with a NON-additive measure: distinct users
    per hour/day/month carried between grains as mergeable HLL
    sketches (register-maxima merges are associative, so the cascaded
    estimate is identical to sketching the raw rows directly). This is
    the only way distinct counts survive re-aggregation at 100 TB —
    exact COUNT(DISTINCT) per grain would need one full shuffle of
    (bucket, user) per grain. Rows-only: DuckDB's approx_distinct uses
    a different sketch; tests assert ≤5% error against exact counts
    and cascade-vs-direct agreement."""
    e = load_table(spark, sf_dir, "events")
    rolled = time_rollup(
        e.select("ts", "user_id"),
        "ts",
        measures={"n_events": ("count", "user_id"),
                  "approx_users": ("approx_distinct", "user_id")},
        grains=("hour", "day", "month"),
    )
    return rolled.select(
        "grain",
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        "n_events",
        "approx_users",
    )


@register(
    "events_gapfill_interpolate",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
      FROM events
    ), types AS (
      SELECT DISTINCT event_type FROM events
    ), spine AS (
      SELECT t.event_type,
             unnest(generate_series(bounds.lo, bounds.hi, INTERVAL 1 HOUR)) AS b
      FROM types t, bounds
    ), hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS b, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ), j AS (
      SELECT s.event_type, s.b, h.n, h.v
      FROM spine s LEFT JOIN hourly h ON s.event_type = h.event_type AND s.b = h.b
    ), f AS (
      SELECT event_type, b, COALESCE(n, 0) AS n, v, epoch_us(b) AS b_us,
        LAST_VALUE(v IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY b
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS p_v,
        LAST_VALUE(CASE WHEN v IS NOT NULL THEN epoch_us(b) END IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY b
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS p_t,
        FIRST_VALUE(v IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY b
          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS n_v,
        FIRST_VALUE(CASE WHEN v IS NOT NULL THEN epoch_us(b) END IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY b
          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS n_t
      FROM j
    )
    SELECT event_type, strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_start,
           n AS n_events,
           COALESCE(v, p_v) AS locf_value,
           CASE WHEN v IS NOT NULL THEN v
                WHEN p_v IS NOT NULL AND n_v IS NOT NULL
                THEN p_v + (n_v - p_v) * ((b_us - p_t) / (n_t - p_t))
           END AS interp_value
    FROM f
    """,
    tags=("events", "timeseries", "gapfill"),
)
def events_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimescaleDB-style ``time_bucket_gapfill`` + ``locf`` +
    ``interpolate``: densify the (event_type x hour) grid over the
    table's full span, then fill each missing hourly value-total both
    ways — carry-forward and time-weighted linear interpolation between
    the neighboring observed hours. ~6% of the grid is gaps at sf0.01.

    Exactness: interpolation is written with the identical operation
    order on both engines (one long/long double division, one multiply,
    one add); bucket epoch micros via the shared ``epoch_micros``
    dialect. Scale: windows run over the aggregated (types x hours)
    grid — bounded by calendar span, not raw volume (see
    ``operators/gapfill`` docstring)."""
    from rag_lakehouse_spark.operators.gapfill import gapfill, time_spine

    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("v"),
        )
    )
    spine = time_spine(e, "ts", ["event_type"], step="1 hour", trunc="hour")
    filled = gapfill(spine, hourly, ["event_type"], bucket_col="bucket", value_col="v")
    return filled.select(
        "event_type",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        F.col("locf_v").alias("locf_value"),
        F.col("interp_v").alias("interp_value"),
    )


_FIVE_MIN_US = 300 * 1_000_000


@register(
    "events_interval_overlap_join",
    oracle=f"""
    WITH p AS (
      SELECT event_id AS p_id,
             epoch_us(date_trunc('second', ts)) AS p_s,
             epoch_us(date_trunc('second', ts)) + {_TEN_MIN_US} AS p_e
      FROM events WHERE event_type = 'purchase' AND value > 200
    ), er AS (
      SELECT event_id AS e_id,
             epoch_us(date_trunc('second', ts)) AS e_s,
             epoch_us(date_trunc('second', ts)) + {_FIVE_MIN_US} AS e_e
      FROM events WHERE event_type = 'error'
    )
    SELECT p_id,
           CAST(COUNT(*) AS BIGINT) AS n_overlaps,
           CAST(SUM(least(p_e, e_e) - greatest(p_s, e_s)) AS BIGINT)
             AS overlap_us
    FROM p JOIN er ON p_s < e_e AND e_s < p_e
    GROUP BY p_id
    """,
    tags=("events", "range-join", "interval-overlap"),
)
def events_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-OVERLAP join (both sides intervals — the primitive
    point-in-interval can't express): high-value purchases open
    10-minute incident windows, errors open 5-minute impact windows;
    per incident, how many error windows overlap it and for how long
    (exact summed microseconds). The oracle is the naive quadratic
    overlap join; the engine runs the bucketed dedup-free plan
    (``operators.range_join.bucketed_interval_join``) — each interval
    explodes to ~2 buckets, the pair is emitted only in the overlap's
    first bucket (no DISTINCT shuffle), and the join is a bucket-id
    hash equi-join. Second-truncated on BOTH sides (the ns-vs-µs
    physical precision rule)."""
    from rag_lakehouse_spark.operators.range_join import bucketed_interval_join

    e = load_table(spark, sf_dir, "events")
    ts_s = epoch_micros(F.date_trunc("second", F.col("ts")))
    p = e.filter((F.col("event_type") == "purchase") & (F.col("value") > 200)).select(
        F.col("event_id").alias("p_id"),
        ts_s.alias("p_s"),
        (ts_s + F.lit(_TEN_MIN_US)).alias("p_e"),
    )
    er = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"),
        ts_s.alias("e_s"),
        (ts_s + F.lit(_FIVE_MIN_US)).alias("e_e"),
    )
    joined = bucketed_interval_join(
        p, er, "p_s", "p_e", "e_s", "e_e", bucket_width=_TEN_MIN_US
    )
    return joined.groupBy("p_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_overlaps"),
        F.sum(
            F.least(F.col("p_e"), F.col("e_e"))
            - F.greatest(F.col("p_s"), F.col("e_s"))
        )
        .cast("bigint")
        .alias("overlap_us"),
    )


@register(
    "events_lag_features",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS b,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_start, n,
           LAG(n, 1) OVER w AS n_lag1,
           LAG(n, 24) OVER w AS n_lag24,
           CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY b
                ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_roll24,
           v,
           LAG(v, 1) OVER w AS v_lag1,
           CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY b
                ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS window_rows
    FROM hourly
    WINDOW w AS (PARTITION BY event_type ORDER BY b)
    """,
    tags=("events", "timeseries", "features", "training-data"),
)
def events_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised-forecasting feature matrix from the hourly series:
    per (event_type, hour), the previous-hour and same-hour-yesterday
    lags, a 24-hour rolling count, and the rolling-window row count
    (so the consumer can mask partial windows at the series head) —
    the standard lag/rolling feature prep a demand-forecast trainer
    consumes. The rolling value mean is left to the consumer as
    n_roll24-style exact sums (an order-dependent AVG of doubles would
    break cross-engine exactness; sums are decimal-exact).

    Scale: windows run over the AGGREGATED (type × hour) grid —
    bounded by calendar span, the gap-fill argument; lags within a
    type sort once per partition key."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("b")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("v"),
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("event_type").orderBy("b")
    w24 = w.rowsBetween(-23, W.currentRow)
    return hourly.select(
        "event_type",
        F.date_format("b", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        "n",
        F.lag("n", 1).over(w).alias("n_lag1"),
        F.lag("n", 24).over(w).alias("n_lag24"),
        F.sum("n").over(w24).cast("bigint").alias("n_roll24"),
        "v",
        F.lag("v", 1).over(w).alias("v_lag1"),
        F.count(F.lit(1)).over(w24).cast("bigint").alias("window_rows"),
    )


@register(
    "events_anomaly_days",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS d, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ), stats AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(c) AS BIGINT) AS s,
             CAST(SUM(c * c) AS BIGINT) AS q
      FROM daily GROUP BY 1
    )
    SELECT d.event_type, strftime(d.d, '%Y-%m-%d') AS day,
           CAST(d.c AS BIGINT) AS n_events,
           (d.c * n - s) * (d.c * n - s) > 4 * (n * q - s * s) AS is_anomaly
    FROM daily d JOIN stats USING (event_type)
    """,
    tags=("events", "timeseries", "anomaly", "monitoring"),
)
def events_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly monitoring with ZERO floats: a day is anomalous
    when its count deviates from its event type's mean by more than
    two standard deviations — evaluated as the integer identity
    ``(x*N - S)^2 > 4*(N*Q - S^2)`` (S = Σcount, Q = Σcount², N =
    days), which is |x-μ| > 2σ with both sides multiplied by N². No
    mean, no sqrt, no cross-engine ulp surface anywhere — the pattern
    for shipping ANY z-score-style gate exactly.

    Scale: the daily rollup is the only data-sized aggregate; stats
    are per-type rows broadcast back."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("q"),
    )
    dev = F.col("c") * F.col("n") - F.col("s")
    return daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("c").cast("bigint").alias("n_events"),
        (dev * dev > 4 * (F.col("n") * F.col("q") - F.col("s") * F.col("s"))).alias(
            "is_anomaly"
        ),
    )


_EWMA_ORACLE = """
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS d, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), packed AS (
      SELECT event_type,
             array_agg(d ORDER BY d) AS ds,
             array_agg(c ORDER BY d) AS cs
      FROM daily GROUP BY 1
    ), folded AS (
      SELECT event_type, ds, cs,
             list_transform(generate_series(1, len(cs)),
                i -> list_reduce(list_prepend(CAST(0 AS BIGINT), cs[1:i]),
                                 (a, b) -> (a + b * 1048576) >> 1)) AS es
      FROM packed
    ), un AS (
      SELECT event_type, unnest(ds) AS d, unnest(cs) AS c, unnest(es) AS e
      FROM folded
    )
    SELECT event_type,
           strftime(d, '%Y-%m-%d') AS day,
           c AS n_events,
           CAST(e AS DOUBLE) / 1048576 AS ewma
    FROM un
    """


@register(
    "events_ewma_daily",
    oracle=_EWMA_ORACLE,
    tags=("events", "timeseries", "smoothing", "monitoring"),
)
def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day exponentially-weighted moving average of event volume
    (alpha = 1/2), per event type — the smoothed baseline a monitoring
    stack plots under the raw daily counts (and the state a drift
    alert compares against).

    EXACTNESS: a float EWMA recurrence is an order-dependent double
    fold — unshippable cross-engine. This one runs in SCALED INTEGERS:
    E_i = (E_{i-1} + c_i * 2^20) >> 1, a pure integer recurrence both
    engines evaluate bit-identically in day order (Spark ``aggregate``
    over the day-sorted array == DuckDB ``list_reduce`` over
    ``array_agg(ORDER BY d)``); the ONLY float is the final /2^20
    display division. Bounded: E ≤ max(c)·2^20, far inside int64.

    Scale: the corpus-sized work is the daily rollup groupBy. The
    per-type day series is CALENDAR-bounded (one element per day), so
    collecting it into an array and running ONE accumulating fold
    (linear in days — the r9 rule, see events_holt_forecast) costs
    O(days) per type — independent of event volume. The
    grouped-series-fold pattern holds whenever the grain is
    time-bounded; it would NOT hold for a per-user series (unbounded
    keys, bounded series) or a per-key unbounded series — those take
    the distributed_scan path."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    return ewma_from_daily(daily)


def ewma_from_daily(daily: DataFrame) -> DataFrame:
    """(event_type, day, n_events, ewma) from a (event_type, d, c)
    daily-count relation — the shared serving fold for the batch query
    above and the streaming-maintained twin below."""
    K = 1 << 20
    packed = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("d", "c"))).alias("ser")
    )
    ser = F.col("ser")
    # One accumulating fold emitting every running EWMA (the r9 Holt
    # rule: never re-fold a growing prefix per element) — the
    # accumulator is the running-E array, each step appends
    # (last + c·K) >> 1 from the previous state (NULL on the empty
    # accumulator → coalesce seeds zero). Bit-identical to the old
    # per-day slice re-fold; the oracle is unchanged.
    zero = F.expr("CAST(array() AS ARRAY<BIGINT>)")

    def step(acc, s):
        prev = F.coalesce(
            F.get(acc, F.size(acc) - 1), F.lit(0).cast("bigint")
        )
        return F.concat(acc, F.array(F.shiftright(prev + s["c"] * K, 1)))

    states = F.aggregate(ser, zero, step)
    items = F.zip_with(
        ser,
        states,
        lambda s, e: F.struct(
            s["d"].alias("d"), s["c"].alias("c"), e.alias("e")
        ),
    )
    return (
        packed.select("event_type", F.explode(items).alias("x"))
        .select(
            "event_type",
            F.date_format(F.col("x.d"), "yyyy-MM-dd").alias("day"),
            F.col("x.c").cast("bigint").alias("n_events"),
            (F.col("x.e").cast("double") / K).alias("ewma"),
        )
    )


@register(
    "events_cusum_changepoints",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS d, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), stats AS (
      SELECT event_type,
             CAST(SUM(c) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM daily GROUP BY 1
    ), packed AS (
      SELECT d.event_type, stats.s, stats.n,
             array_agg(d.d ORDER BY d.d) AS ds,
             array_agg(d.c ORDER BY d.d) AS cs
      FROM daily d JOIN stats USING (event_type)
      GROUP BY 1, 2, 3
    ), folded AS (
      SELECT event_type, ds, cs, s, n,
             list_transform(generate_series(1, len(cs)),
                i -> list_reduce(list_prepend(CAST(0 AS BIGINT), cs[1:i]),
                                 (a, x) -> greatest(CAST(0 AS BIGINT),
                                                    a + x * n - s))) AS gs
      FROM packed
    ), un AS (
      SELECT event_type, s, n,
             unnest(ds) AS d, unnest(cs) AS c, unnest(gs) AS g
      FROM folded
    )
    SELECT event_type,
           strftime(d, '%Y-%m-%d') AS day,
           c AS n_events,
           g AS cusum_num,
           g > 3 * s AS is_shifted
    FROM un
    """,
    tags=("events", "timeseries", "changepoint", "monitoring"),
)
def events_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM upward-shift detection over daily event volume
    — the changepoint monitor that catches a SUSTAINED level shift
    (new traffic source, runaway producer) that per-day two-sigma
    anomaly gates miss because no single day is extreme.

    ZERO floats: the classic recurrence S_i = max(0, S_{i-1} + x_i - μ)
    is scaled by N (days) so the drift term is the integer
    ``x_i·N - S`` (S = Σcounts): G_i = max(0, G_{i-1} + c_i·N - S),
    folded in day order — Spark ``aggregate`` == DuckDB
    ``list_reduce``, bit-identical. The alarm G > 3·S·N/N == G > 3S
    fires at ~3 mean-days of accumulated excess. Same calendar-bounded
    grouped-series fold as ``events_ewma_daily`` — one element per
    day, one linear accumulating fold per type (the r9 rule)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    stats = daily.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    packed = daily.join(F.broadcast(stats), "event_type").groupBy(
        "event_type", "s", "n"
    ).agg(F.array_sort(F.collect_list(F.struct("d", "c"))).alias("ser"))
    ser = F.col("ser")
    # One accumulating fold (the r9 rule — see events_holt_forecast):
    # the accumulator is the running-G array, each step appends
    # max(0, last + c·N − S); bit-identical, oracle unchanged.
    zero = F.expr("CAST(array() AS ARRAY<BIGINT>)")

    def step(acc, x):
        prev = F.coalesce(
            F.get(acc, F.size(acc) - 1), F.lit(0).cast("bigint")
        )
        return F.concat(
            acc,
            F.array(
                F.greatest(
                    F.lit(0).cast("bigint"),
                    prev + x["c"] * F.col("n") - F.col("s"),
                )
            ),
        )

    states = F.aggregate(ser, zero, step)
    items = F.zip_with(
        ser,
        states,
        lambda x, g: F.struct(
            x["d"].alias("d"), x["c"].alias("c"), g.alias("g")
        ),
    )
    return (
        packed.select("event_type", "s", F.explode(items).alias("x"))
        .select(
            "event_type",
            F.date_format(F.col("x.d"), "yyyy-MM-dd").alias("day"),
            F.col("x.c").cast("bigint").alias("n_events"),
            F.col("x.g").cast("bigint").alias("cusum_num"),
            (F.col("x.g") > 3 * F.col("s")).alias("is_shifted"),
        )
    )


@register(
    "events_daily_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', TIMESTAMP '1995-01-01 00:00:00',
                       date_trunc('day', ts)) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM daily GROUP BY 1
    )
    SELECT event_type, n AS n_days,
           CASE WHEN n * sxx - sx * sx <> 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / (n * sxx - sx * sx) END AS slope_per_day,
           (n * sxy - sx * sy) * (n * sxy - sx * sy) > 0
           AND (n * sxy - sx * sy) > 0 AS is_growing
    FROM s
    """,
    tags=("events", "timeseries", "regression", "monitoring"),
)
def events_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type volume trend: the ordinary-least-squares slope of
    daily event counts over the day index — the one number a capacity
    planner reads ("growing how fast?"), plus an integer-sign growth
    flag.

    ZERO float accumulation: the closed form
    slope = (N·Σxy − Σx·Σy) / (N·Σxx − Σx²) is four integer SUMs (day
    index × count — both exact integers) combined in one final
    division; the growth flag is a pure integer sign test. Bounds: x ≤
    ~10⁴ (calendar days), y daily counts — N·Σxy stays far inside
    int64 for any per-type daily series measured in billions/day.

    Scale: one daily rollup groupBy + one per-type aggregate — no
    windows, no folds; the cheapest possible shape."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", F.col("ts")).cast("date"),
            F.lit("1995-01-01").cast("date"),
        ).alias("x"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.when(den != 0, num.cast("double") / den).alias("slope_per_day"),
        ((num * num > 0) & (num > 0)).alias("is_growing"),
    )


@register(
    "events_ewma_incremental",
    oracle=_EWMA_ORACLE,
    tags=("events", "timeseries", "smoothing", "streaming"),
)
def events_ewma_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EWMA baseline served from a STREAMING-maintained daily-count
    state, hash-checked against the SAME oracle as the batch
    ``events_ewma_daily``: events replay through an availableNow file
    stream (maxFilesPerTrigger=1 over a 4-file copy ⇒ ≥4 micro-batches
    folding (event_type, day) counts into the versioned state via
    ``streaming.rollup_sink.maintain_daily_type_counts``), then the
    SAME ``ewma_from_daily`` fold runs over the state. Counts are
    mergeable, so batch boundaries cannot move the smoothed series —
    incremental must equal one-shot, bit for bit.

    This closes the monitoring loop the way the dedup/BM25/IVF indexes
    did for search: one maintained state (bounded by types × days),
    per-increment cost of one micro-batch, every derived monitor
    (EWMA here; CUSUM/trend read the same state) exact over FULL
    history with no rescan."""
    import os
    import shutil
    import tempfile

    from rag_lakehouse_spark.streaming.rollup_sink import (
        maintain_daily_type_counts,
        read_state,
    )

    base = tempfile.mkdtemp(prefix="rls_ewma_stream_")
    try:
        src = os.path.join(base, "events")
        (
            load_table(spark, sf_dir, "events")
            .select("event_type", "ts")
            .repartition(4)
            .write.mode("overwrite")
            .parquet(src)
        )
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(base, "daily_counts")
        maintain_daily_type_counts(spark, stream, state).awaitTermination()
        daily = read_state(spark, state).drop("last_batch_id", "ckpt_id")
        return ewma_from_daily(daily).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


_HOLT_ORACLE = """
    WITH RECURSIVE daily AS (
      SELECT event_type, date_trunc('day', ts) AS d, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), packed AS (
      SELECT event_type,
             array_agg(d ORDER BY d) AS ds,
             array_agg(c ORDER BY d) AS cs
      FROM daily GROUP BY 1
    ), f AS (
      SELECT event_type, ds, cs, 1 AS i,
             (cs[1] * 1048576) >> 1 AS l,
             ((cs[1] * 1048576) >> 1) >> 1 AS t
      FROM packed
      UNION ALL
      SELECT event_type, ds, cs, i + 1,
             (cs[i+1] * 1048576 + l + t) >> 1,
             (((cs[i+1] * 1048576 + l + t) >> 1) - l + t) >> 1
      FROM f WHERE i < len(cs)
    )
    SELECT event_type,
           strftime(ds[i], '%Y-%m-%d') AS day,
           cs[i] AS n_events,
           CAST(l AS DOUBLE) / 1048576 AS level,
           CAST(t AS DOUBLE) / 1048576 AS trend,
           CAST(l + t AS DOUBLE) / 1048576 AS forecast_next
    FROM f
    """


@register(
    "events_holt_forecast",
    oracle=_HOLT_ORACLE,
    tags=("events", "timeseries", "forecast", "monitoring"),
)
def events_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing over daily event volume
    (α = β = 1/2, zero-initialized): per day the smoothed level, the
    smoothed trend, and the one-step forecast level+trend — the
    short-horizon capacity forecast that EWMA (no trend term) lags on
    ramping series.

    The recurrence carries TWO state variables and must emit EVERY
    intermediate state, so the Spark side is one ``aggregate`` fold
    whose accumulator is the running (level, trend) state ARRAY — each
    step appends the next state from the last — in scaled integers
    (K = 2^20) with arithmetic ``>> 1`` (floor: Java and DuckDB agree
    on negatives, so a falling trend stays bit-identical).
    Zero-initialization is the documented semantics: level warms up
    from 0 exactly identically on both engines.

    ORACLE DIALECT RULE (found building this query): DuckDB
    ``list_reduce`` with STRUCT accumulators mis-resolves accumulator
    fields across the struct_pack being built (within one lambda call,
    ``a.t`` evaluated correctly in one field and as the element's 0 in
    the next — minimal repro in ROUND_NOTES r8). Scalar-accumulator
    folds (EWMA, CUSUM, RM3, PSI) are unaffected; any MULTI-variable
    recurrence oracles as a recursive CTE over the day index instead,
    as here.

    Same calendar-bounded grouped-series-fold legality argument as
    ``events_ewma_daily``/``events_cusum_changepoints``.

    RULE (generalizes, next to the EWMA/CUSUM scaled-integer note): a
    recurrence that must EMIT every intermediate state is still ONE
    accumulating fold — the accumulator is the running state ARRAY and
    each step appends ``f(last, x)`` (``get(acc, size-1)`` is NULL on
    the empty accumulator → coalesce seeds the zero state). Never
    re-fold a growing prefix per element (the r8 form ran
    ``aggregate(slice(ser, 1, i), …)`` per day — O(days²) arithmetic
    per event_type); the append fold is linear in fold steps and
    bit-identical, since each state is computed once by the same
    scaled-integer step. Precision on the cost claim: the ARITHMETIC
    is linear, but ``concat(acc, array(...))`` copies the growing
    accumulator each step, so element COPIES are still O(days²) —
    harmless on calendar-bounded series (days ≤ thousands; copies are
    memmoves, not recurrence steps), and Spark exposes no cheaper
    in-place append. Unbounded series take ``distributed_scan``, not
    this fold."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    return holt_from_daily(daily)


def holt_from_daily(daily: DataFrame) -> DataFrame:
    """(event_type, day, n_events, level, trend, forecast_next) from a
    (event_type, d, c) daily-count relation — the shared serving fold
    for the batch query above and the streaming-maintained twin below
    (same pattern as ``ewma_from_daily``)."""
    K = 1 << 20
    packed = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("d", "c"))).alias("ser")
    )
    ser = F.col("ser")
    zero = F.expr("CAST(array() AS ARRAY<STRUCT<l: BIGINT, t: BIGINT>>)")

    def step(acc, s):
        prev = F.get(acc, F.size(acc) - 1)  # NULL on the empty acc
        pl = F.coalesce(prev["l"], F.lit(0).cast("bigint"))
        pt = F.coalesce(prev["t"], F.lit(0).cast("bigint"))
        lp = s["c"] * K + pl + pt
        l_new = F.shiftright(lp, 1)
        t_new = F.shiftright(l_new - pl + pt, 1)
        return F.concat(
            acc, F.array(F.struct(l_new.alias("l"), t_new.alias("t")))
        )

    states = F.aggregate(ser, zero, step)
    items = F.zip_with(
        ser,
        states,
        lambda s, st: F.struct(
            s["d"].alias("d"), s["c"].alias("c"), st.alias("s")
        ),
    )
    return (
        packed.select("event_type", F.explode(items).alias("x"))
        .select(
            "event_type",
            F.date_format(F.col("x.d"), "yyyy-MM-dd").alias("day"),
            F.col("x.c").cast("bigint").alias("n_events"),
            (F.col("x.s.l").cast("double") / K).alias("level"),
            (F.col("x.s.t").cast("double") / K).alias("trend"),
            ((F.col("x.s.l") + F.col("x.s.t")).cast("double") / K).alias(
                "forecast_next"
            ),
        )
    )


@register(
    "events_holt_incremental",
    oracle=_HOLT_ORACLE,
    tags=("events", "timeseries", "forecast", "streaming"),
)
def events_holt_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Holt level/trend forecast served from the STREAMING-
    maintained daily-count state, hash-checked against the SAME
    oracle as the batch ``events_holt_forecast`` — the third serving
    fold over the one maintained (event_type, day) count state
    (EWMA and the monitoring family read it too): events replay
    through an availableNow file stream (maxFilesPerTrigger=1 over a
    4-file copy ⇒ ≥4 micro-batches folding counts via
    ``streaming.rollup_sink.maintain_daily_type_counts``), then the
    SAME ``holt_from_daily`` accumulating fold runs over the state.
    Counts are mergeable, so batch boundaries cannot move the
    smoothed level or trend — incremental must equal one-shot, bit
    for bit.

    One maintained state, many exact monitors — the analytics-side
    mirror of the one-postings-index/two-serving-paths rule from the
    search family."""
    import os
    import shutil
    import tempfile

    from rag_lakehouse_spark.streaming.rollup_sink import (
        maintain_daily_type_counts,
        read_state,
    )

    base = tempfile.mkdtemp(prefix="rls_holt_stream_")
    try:
        src = os.path.join(base, "events")
        (
            load_table(spark, sf_dir, "events")
            .select("event_type", "ts")
            .repartition(4)
            .write.mode("overwrite")
            .parquet(src)
        )
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(base, "daily_counts")
        maintain_daily_type_counts(spark, stream, state).awaitTermination()
        daily = read_state(spark, state).drop("last_batch_id", "ckpt_id")
        return holt_from_daily(daily).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
