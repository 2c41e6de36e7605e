"""Bucketed-join shuffle elimination, salted-join correctness, grouped
applyInPandas operators, stateful streaming, and stamping/round-trip
coverage."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rag_lakehouse_spark.operators.grouped import (
    center_embeddings_per_label,
    robust_zscore_per_group,
)
from rag_lakehouse_spark.operators.joins import bucketed_join, salted_join, write_bucketed
from rag_lakehouse_spark.sources.tables import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path_factory):
    import shutil

    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        loc = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").replace(
            "file:", ""
        )
        shutil.rmtree(f"{loc}/{t}", ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "b_orders", "o_orderkey", 8, sort_col="o_orderkey")
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", 8
    )
    # force a sort-merge join: at test scale the planner would broadcast
    # (and skip bucketing); at real scale both sides are too big to
    # broadcast and the bucketed SMJ is exactly what runs
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # co-located buckets join shuffle-free
        assert "SortMergeJoin" in plan
        # and the result is correct
        expect = (
            load_table(spark, sf_dir, "orders")
            .join(
                load_table(spark, sf_dir, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .count()
        )
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_totalprice"
    )
    plain = li.join(o, "k").agg(F.count(F.lit(1)), F.sum("o_totalprice")).collect()[0]
    salted = salted_join(li, o, "k", salt=4).agg(
        F.count(F.lit(1)), F.sum("o_totalprice")
    ).collect()[0]
    assert tuple(plain) == tuple(salted)


def test_center_embeddings_per_label(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = center_embeddings_per_label(emb)
    rows = out.filter(F.col("label") == 0).collect()
    V = np.stack([np.asarray(r.centered) for r in rows])
    # per-label mean removed → centroid ~0
    assert np.abs(V.mean(axis=0)).max() < 1e-4
    assert all(len(r.centered) == 64 for r in rows)


def test_robust_zscore_per_group(spark):
    df = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(9)] + [(9, "g", 1000.0)],
        "id long, grp string, v double",
    )
    out = {r.id: r.robust_z for r in robust_zscore_per_group(df, "grp", "v", "id").collect()}
    assert abs(out[4]) < 1.0       # median element ~0
    assert out[9] > 100            # outlier flagged


def test_stateful_running_totals_stream(spark, sf_dir, tmp_path_factory):
    from rag_lakehouse_spark.streaming import read_events_stream
    from rag_lakehouse_spark.streaming.stateful import running_user_totals

    out_dir = str(tmp_path_factory.mktemp("events_state"))
    load_table(spark, sf_dir, "events").coalesce(1).write.mode("overwrite").parquet(out_dir)
    stream = read_events_stream(spark, out_dir)
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("state_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r.user_id: (r.n_events_total, r.value_total)
        for r in spark.sql("SELECT * FROM state_out").collect()
    }
    batch = (
        spark.read.parquet(out_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("v"),
        )
    )
    want = {r.user_id: (r.n, float(r.v)) for r in batch.collect()}
    for uid, (n, v) in want.items():
        assert got[uid][0] == n
        assert got[uid][1] == pytest.approx(v, abs=0.05)


def test_metadata_stamping(spark):
    """Reference record stamping (jobs/scraper.py:170-172): uuid per
    row + formatted timestamp — nondeterministic, so format/uniqueness
    asserted instead of oracle-compared."""
    df = spark.range(100).select(
        F.expr("uuid()").alias("id"),
        F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss").alias("scraped_at"),
    )
    rows = df.collect()
    assert len({r.id for r in rows}) == 100
    import re

    assert all(
        re.fullmatch(r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}", r.id)
        for r in rows
    )
    assert all(re.fullmatch(r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}", r.scraped_at) for r in rows)


def test_embedding_table_roundtrip(spark, sf_dir, tmp_path_factory):
    """V4 vector-sink parity: embeddings (array<float>) survive a
    partitioned parquet write/read bit-exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = str(tmp_path_factory.mktemp("emb_sink"))
    emb.withColumn("part", F.col("label") % 4).write.mode("overwrite").partitionBy(
        "part"
    ).parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == emb.count()
    a = {r.vec_id: r.embedding for r in emb.collect()}
    b = {r.vec_id: r.embedding for r in back.collect()}
    assert a == b
