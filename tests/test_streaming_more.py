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


def test_stream_static_enrichment_matches_batch(spark, events_dir):
    from rag_lakehouse_spark.streaming import enrich_stream_static

    static = spark.read.parquet(events_dir)
    # dim: per-user profile snapshot derived offline
    dim = static.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_total"))
    stream = read_events_stream(spark, events_dir)
    run_batch_to_memory(enrich_stream_static(stream, dim), "enriched_out")
    got = spark.sql("SELECT * FROM enriched_out")
    assert got.count() == static.count()  # inner join on a complete dim
    assert "n_total" in got.columns
    # every row carries its user's profile value
    bad = got.join(dim.withColumnRenamed("n_total", "want"), "user_id").filter(
        F.col("n_total") != F.col("want")
    )
    assert bad.count() == 0


def test_stream_stream_join_matches_batch(spark, events_dir):
    from rag_lakehouse_spark.streaming import click_purchase_stream_join

    stream = read_events_stream(spark, events_dir)
    run_batch_to_memory(click_purchase_stream_join(stream), "funnel_out")
    got = {
        (r.click_id, r.purchase_id)
        for r in spark.sql("SELECT * FROM funnel_out").collect()
    }
    e = spark.read.parquet(events_dir)
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    want = {
        (r.click_id, r.purchase_id)
        for r in clicks.join(
            purch,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") > F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 30 minutes")
            ),
        ).collect()
    }
    assert got == want and len(want) > 0


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


def test_hll_register_state_equals_batch_and_is_idempotent(spark, sf_dir, tmp_path_factory):
    """r11: the streaming-maintained HLL registers must equal the
    one-shot batch registers over the same events (mergeable max), and
    re-folding an already-applied batch id must be a no-op (the
    watermark skip)."""
    from pyspark.sql import functions as F

    from rag_lakehouse_spark.plans.advanced_queries import hll_register_rows
    from rag_lakehouse_spark.streaming.rollup_sink import (
        _hll_merge,
        _hll_partials,
        fold_batch,
        read_hll_registers,
    )

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    state = str(tmp_path_factory.mktemp("hll_state")) + "/regs"
    # split into two overlapping halves and fold as two batches
    h1 = ev.filter(F.col("user_id") % 2 == 0)
    h2 = ev.filter((F.col("user_id") % 2 == 1) | (F.col("user_id") % 4 == 0))
    for bid, b in ((0, h1), (1, h2)):
        assert fold_batch(
            spark, state, b, bid, "ckpt-test",
            partial_fn=_hll_partials, merge_fn=_hll_merge,
        )
    # replaying batch 1 must be skipped, not double-folded
    assert not fold_batch(
        spark, state, h2, 1, "ckpt-test",
        partial_fn=_hll_partials, merge_fn=_hll_merge,
    )
    got = {
        (r.event_type, r.idx): r.reg_max
        for r in read_hll_registers(spark, state).collect()
    }
    want = {
        (r.event_type, r.idx): r.reg_max
        for r in hll_register_rows(ev.unionByName(ev.filter(F.col("user_id") % 4 == 0)))
        .groupBy("event_type", "idx")
        .agg(F.max("rho").alias("reg_max"))
        .collect()
    }
    assert got == want


def test_weighted_sample_fold_equals_batch_and_tolerates_overlap(
    spark, sf_dir, tmp_path_factory
):
    """r11: bottom-k race keys are idempotent+mergeable (identical
    deterministic keys dedupe; min-k of a union == min-k of min-ks) —
    OVERLAPPING batches folded through the versioned state must equal
    the one-shot sample, and a replayed batch id is a no-op."""
    from pyspark.sql import functions as F

    from rag_lakehouse_spark.plans.corpus_queries import (
        bottom_k_sample,
        weighted_sample_keys,
    )
    from rag_lakehouse_spark.streaming.rollup_sink import (
        _wsample_merge,
        _wsample_partials,
        fold_batch,
        read_weighted_sample,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    state = str(tmp_path_factory.mktemp("wsample_state")) + "/sample"
    b0 = d.filter(F.col("doc_id") % 2 == 0)
    b1 = d.filter(  # overlaps b0 on %4==0 — identical keys must dedupe
        (F.col("doc_id") % 2 == 1) | (F.col("doc_id") % 4 == 0)
    )
    for bid, b in ((0, b0), (1, b1)):
        assert fold_batch(
            spark, state, b, bid, "ckpt-test",
            partial_fn=_wsample_partials, merge_fn=_wsample_merge,
        )
    assert not fold_batch(
        spark, state, b1, 1, "ckpt-test",
        partial_fn=_wsample_partials, merge_fn=_wsample_merge,
    )
    got = sorted(
        (r.doc_id, r.n_chars, r.sample_key)
        for r in read_weighted_sample(spark, state).collect()
    )
    want = sorted(
        (r.doc_id, r.n_chars, r.sample_key)
        for r in bottom_k_sample(weighted_sample_keys(d)).collect()
    )
    assert got == want


# r16 (VERDICT r15 #2): long referee family - excluded from the
# default fast run; seal runs use -m "slow or not slow".
pytestmark = pytest.mark.slow
