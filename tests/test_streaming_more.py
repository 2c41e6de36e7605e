"""Sliding-window stream-vs-batch agreement and an exactly-once-style
foreachBatch parquet sink."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_lakehouse_spark.sources.tables import load_table
from rag_lakehouse_spark.streaming import (
    read_events_stream,
    run_batch_to_memory,
    sliding_window_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_sliding"))
    load_table(spark, sf_dir, "events").coalesce(2).write.mode("overwrite").parquet(out)
    return out


def test_sliding_stream_matches_batch_windows(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    run_batch_to_memory(
        sliding_window_counts(stream, window="1 hour", slide="30 minutes"),
        "sliding_out",
        output_mode="complete",
    )
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM sliding_out").collect()
    }
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("ws"), "event_type", "n"
        )
    )
    want = {(r.ws, r.event_type): r.n for r in batch.collect()}
    assert got == want


def test_foreach_batch_parquet_sink(spark, events_dir, tmp_path_factory):
    """foreachBatch sink: per-micro-batch idempotent parquet write —
    the exactly-once pattern for sinks without native streaming
    support (each epoch writes its own partition directory)."""
    sink = str(tmp_path_factory.mktemp("fb_sink"))
    stream = read_events_stream(spark, events_dir)
    agg = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))

    def write_epoch(df, epoch_id: int) -> None:
        df.withColumn("epoch", F.lit(epoch_id)).write.mode("overwrite").parquet(
            f"{sink}/epoch={epoch_id}"
        )

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(write_epoch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    final = spark.read.parquet(f"{sink}/epoch=0")
    want = {
        r.event_type: r.n
        for r in spark.read.parquet(events_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {r.event_type: r.n for r in final.collect()}
    assert got == want
