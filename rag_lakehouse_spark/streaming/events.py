"""Structured Streaming surface over the events stream (SURVEY.md
§2.10 — the reference is batch-only; this is the event-time layer a
stream table needs).

Design: every streaming transform here is a thin wrapper over the same
logic the batch queries use (plans.events_queries), applied to a
``readStream`` DataFrame with a watermark. Batch checks the semantics
against the DuckDB oracle; streaming tests replay the same parquet
through the file source and assert agreement with batch — the
batch/stream unification Spark's API is built for.

Scale notes: windowed aggs and dedup keep state per (key, window) in
the state store; the watermark bounds state size. session_window uses
the built-in gap-merge operator. All shuffles are on the grouping keys
only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a directory of event parquet/json.
    (The parquet file source replays existing files then tails new
    ones — the local stand-in for a Kafka topic.)

    ``max_files_per_trigger`` bounds each micro-batch to N files —
    production backpressure control, and the test lever for forcing a
    deterministic multi-batch replay (late/out-of-order arrival is only
    observable across micro-batch boundaries)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if path.endswith(".json") or path.endswith("/json"):
        return reader.json(path)
    return reader.parquet(path)


def tumbling_window_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window aggregation with late-data watermark —
    streaming twin of plans.events_queries.events_tumbling_hourly."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_window_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding (overlapping) event-time windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def session_window_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows (30-min inactivity gap) per user — the built-in
    stateful twin of the batch lag/cumsum sessionization
    (plans.events_queries.events_sessionize)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Drop duplicate event_ids arriving within the watermark window —
    streaming twin of the batch keyed dedup."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def enrich_stream_static(events: DataFrame, dim: DataFrame, on: str = "user_id") -> DataFrame:
    """Stream-static join: each micro-batch joins against the (small,
    broadcast) dimension snapshot — the standard enrichment shape
    (stream of events × slowly-changing user/product dim). No state
    store involved; the dim is re-resolved per micro-batch, so a
    Delta/parquet-backed dim picks up updates between batches."""
    return events.join(F.broadcast(dim), on)


def click_purchase_stream_join(
    events: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: purchases attributed to a
    prior click by the same user within ``horizon`` — the canonical
    funnel/attribution join.

    State-store bounds come from BOTH watermarks plus the time-range
    predicate: a click can be dropped from state once no purchase
    within the horizon can still arrive (event-time watermark + range
    condition — Spark derives the state cleanup from exactly this
    conjunction). Shuffle is on user_id for both sides.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
    ).select("user_id", "click_id", "click_ts", "purchase_id", "purchase_ts", "purchase_value")


def run_batch_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming query over the currently-available input to
    completion, materializing into an in-memory table ``name``.
    Returns the stopped query; read results via
    ``spark.sql(f"SELECT * FROM {name}")``. Local test/dev helper —
    production sinks are writeStream.format('parquet'/'kafka'/...)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return q
