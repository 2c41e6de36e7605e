"""Streaming/batch unification tests: replay the events parquet through
the file-source stream and assert the windowed aggregations agree with
the equivalent batch computation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_lakehouse_spark.sources.tables import load_table
from rag_lakehouse_spark.streaming import (
    dedup_within_watermark,
    read_events_stream,
    run_batch_to_memory,
    session_window_agg,
    tumbling_window_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    # Re-write events as a clean parquet DIRECTORY with us-precision
    # timestamps (the raw driver file is ns, which the streaming file
    # source schema reads as long).
    out = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, sf_dir, "events").coalesce(2).write.mode("overwrite").parquet(out)
    return out


def test_tumbling_stream_matches_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    # complete mode: append would withhold windows newer than the
    # watermark at end-of-input, making the batch comparison a subset
    q = run_batch_to_memory(
        tumbling_window_counts(stream), "tumbling_out", output_mode="complete"
    )
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("ws"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("v"),
        )
    )
    want = {(r.ws, r.event_type): (r.n, r.v) for r in batch.collect()}
    assert got == want


def test_session_window_stream_runs(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    run_batch_to_memory(session_window_agg(stream), "session_out")
    out = spark.sql("SELECT * FROM session_out")
    assert out.count() > 0
    # session windows never overlap per user
    w = out.groupBy("user_id", "session_start").count().filter(F.col("count") > 1)
    assert w.count() == 0


def test_dedup_within_watermark_stream(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    run_batch_to_memory(dedup_within_watermark(stream), "dedup_out")
    out = spark.sql("SELECT * FROM dedup_out")
    n_batch = spark.read.parquet(events_dir).select("event_id").distinct().count()
    assert out.count() == n_batch
    assert out.select("event_id").distinct().count() == n_batch


def test_dedup_late_out_of_order_matches_batch(spark, tmp_path_factory):
    """Late-data depth for dropDuplicatesWithinWatermark: duplicates and
    a brand-new event arrive in a LATER micro-batch with OLDER event
    times (out-of-order, inside the 2h watermark). Output must equal
    the batch twin's keyed dedup — duplicates dropped even though they
    crossed a batch boundary, the late new event kept."""
    import datetime
    import shutil

    root = tmp_path_factory.mktemp("late_events")
    stream_dir = root / "stream"
    stream_dir.mkdir()
    base = datetime.datetime(2026, 1, 1, 9, 0, 0)

    def row(i: int, minutes: int):
        return (
            i, base + datetime.timedelta(minutes=minutes), i % 7,
            "click", float(i), "{}",
        )

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    batch1 = [row(i, i) for i in range(50)]  # 09:00..09:49
    batch2 = (
        [row(i, 120) for i in range(50, 60)]  # 11:00 — advances watermark
        + [row(i, i) for i in range(20)]      # replayed dups, OLD event times
        + [row(99, 5)]                        # genuinely new, late, 09:05
    )
    for n, rows in (("0001", batch1), ("0002", batch2)):
        tmp = str(root / f"tmp_{n}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(p for p in __import__("os").listdir(tmp) if p.endswith(".parquet"))
        shutil.copy(f"{tmp}/{part}", str(stream_dir / f"{n}.parquet"))

    stream = read_events_stream(spark, str(stream_dir), max_files_per_trigger=1)
    run_batch_to_memory(dedup_within_watermark(stream), "late_dedup_out")
    got = sorted(
        (r.event_id, r.ts, r.value)
        for r in spark.sql("SELECT * FROM late_dedup_out").collect()
    )
    want = sorted(
        (r.event_id, r.ts, r.value)
        for r in spark.read.parquet(str(stream_dir))
        .dropDuplicates(["event_id"])
        .collect()
    )
    assert len(got) == 61  # 0..59 plus the late new id 99
    assert got == want


# r16 (VERDICT r15 #2): long referee family - excluded from the
# default fast run; seal runs use -m "slow or not slow".
pytestmark = pytest.mark.slow
