"""Operator-level checks for the bucketed range join and the
multi-resolution time rollup (the registered queries are additionally
oracle-checked in test_oracle.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from rag_lakehouse_spark.operators.range_join import bucketed_range_join, epoch_micros
from rag_lakehouse_spark.operators.rollup import time_rollup
from rag_lakehouse_spark.sources.tables import load_table


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_bucketed_range_join_matches_naive_nonequi(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    ts_us = epoch_micros(F.col("ts"))
    pts = e.select(F.col("event_id").alias("pid"), ts_us.alias("t"))
    iv = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("iid"),
        ts_us.alias("lo"),
        (ts_us + F.lit(300_000_000)).alias("hi"),
    )
    got = bucketed_range_join(pts, iv, "t", "lo", "hi", bucket_width=300_000_000)
    naive = pts.join(iv, (F.col("t") >= F.col("lo")) & (F.col("t") < F.col("hi")))
    assert _rows(got, ["pid", "iid"]) == _rows(naive, ["pid", "iid"])
    assert got.count() > 0


def test_bucketed_range_join_end_inclusive_and_keys(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    ts_us = epoch_micros(F.col("ts"))
    pts = e.select("user_id", F.col("event_id").alias("pid"), ts_us.alias("t"))
    iv = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("iid"),
        ts_us.alias("lo"),
        (ts_us + F.lit(3_600_000_000)).alias("hi"),
    )
    got = bucketed_range_join(
        pts, iv, "t", "lo", "hi",
        bucket_width=3_600_000_000, extra_keys=("user_id",), end_inclusive=True,
    )
    naive = pts.join(
        iv.withColumnRenamed("user_id", "u2"),
        (F.col("t") >= F.col("lo"))
        & (F.col("t") <= F.col("hi"))
        & (F.col("user_id") == F.col("u2")),
    )
    assert _rows(got, ["pid", "iid"]) == _rows(naive, ["pid", "iid"])
    # the defining self-match (interval start == its own point) survives
    assert got.filter(F.col("pid") == F.col("iid")).count() == iv.count()


def test_bucketed_range_join_rejects_bad_width(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("pid"), F.lit(0).alias("t")
    )
    with pytest.raises(ValueError):
        bucketed_range_join(e, e, "t", "t", "t", bucket_width=0)


def test_time_rollup_grains_agree_with_direct_aggregation(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").withColumn(
        "__v", F.col("value").cast("decimal(12,2)")
    )
    rolled = time_rollup(
        e.select("ts", "__v"),
        "ts",
        measures={"n": ("count", "__v"), "v": ("sum", "__v")},
        grains=("hour", "day", "month"),
    ).cache()
    for grain in ("hour", "day", "month"):
        direct = e.groupBy(F.date_trunc(grain, "ts").alias("bucket_start")).agg(
            F.count(F.lit(1)).alias("n"), F.sum("__v").alias("v")
        )
        got = rolled.filter(F.col("grain") == grain)
        assert _rows(got, ["bucket_start", "n"]) == _rows(direct, ["bucket_start", "n"])
        gv = {r["bucket_start"]: r["v"] for r in got.collect()}
        for r in direct.collect():
            assert gv[r["bucket_start"]] == r["v"]
    rolled.unpersist()


def test_time_rollup_validates_arguments(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError):
        time_rollup(e, "ts", {"n": ("count", "ts")}, grains=("day", "hour"))
    with pytest.raises(ValueError):
        time_rollup(e, "ts", {"n": ("median", "ts")})
    with pytest.raises(ValueError):
        time_rollup(e, "ts", {"n": ("count", "ts")}, grains=("decade",))


def test_time_rollup_sketch_distinct_accuracy_and_cascade(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    rolled = time_rollup(
        e.select("ts", "user_id"),
        "ts",
        measures={"approx_users": ("approx_distinct", "user_id")},
        grains=("hour", "day", "month"),
    ).cache()
    for grain in ("hour", "month"):
        exact = {
            r["bucket_start"]: r["x"]
            for r in e.groupBy(F.date_trunc(grain, "ts").alias("bucket_start"))
            .agg(F.countDistinct("user_id").alias("x"))
            .collect()
        }
        got = {
            r["bucket_start"]: r["approx_users"]
            for r in rolled.filter(F.col("grain") == grain).collect()
        }
        assert set(got) == set(exact)
        for b, est in got.items():
            assert abs(est - exact[b]) <= max(2, 0.05 * exact[b]), (grain, b, est, exact[b])
    # cascade (hour→day→month unions) == direct sketch over raw rows
    direct = {
        r["bucket_start"]: r["x"]
        for r in e.groupBy(F.date_trunc("month", "ts").alias("bucket_start"))
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("x"))
        .collect()
    }
    cascaded = {
        r["bucket_start"]: r["approx_users"]
        for r in rolled.filter(F.col("grain") == "month").collect()
    }
    assert cascaded == direct
    rolled.unpersist()


def test_events_loader_normalizes_ts_to_timestamp(spark, sf_dir):
    """The loader's contract: whatever the parquet reader resolves the
    TIMESTAMP(NANOS) column to in this environment (raw nanos long, or
    TIMESTAMP_NTZ under some reader configs), load_table hands
    downstream operators a plain TIMESTAMP — unix_micros/window/
    session_window all require it (the r5 TIMESTAMP_NTZ break)."""
    from pyspark.sql import types as T

    ts_type = load_table(spark, sf_dir, "events").schema["ts"].dataType
    assert isinstance(ts_type, T.TimestampType), ts_type
    # and epoch_micros is total over a NTZ column regardless
    ntz = spark.sql("SELECT TIMESTAMP_NTZ '2024-01-02 03:04:05.123456' AS t")
    micros = ntz.select(epoch_micros(F.col("t")).alias("us")).first()[0]
    assert micros == 1704164645123456  # UTC session tz pinned


def test_gapfill_locf_and_interpolation_values(spark):
    """Hand-computable series: hours 0,1,3,6 observed (values 10, 20,
    NULL-sum gap at 2, 50 at 3, gaps 4-5, 80 at 6). LOCF carries the
    previous observation; interp is time-weighted between neighbors;
    the envelope (before first / after last observation) stays NULL."""
    from datetime import datetime

    from rag_lakehouse_spark.operators.gapfill import gapfill, time_spine

    def h(i):
        return datetime(2024, 1, 1, i, 0, 0)

    raw = spark.createDataFrame(
        [("a", h(0), 10.0), ("a", h(1), 20.0), ("a", h(3), 50.0), ("a", h(6), 80.0)],
        "k string, ts timestamp, value double",
    )
    observed = raw.groupBy("k", F.date_trunc("hour", "ts").alias("bucket")).agg(
        F.sum("value").alias("v")
    )
    spine = time_spine(raw, "ts", ["k"])
    out = {
        r["bucket"].hour: (r["locf_v"], r["interp_v"])
        for r in gapfill(spine, observed, ["k"]).collect()
    }
    assert len(out) == 7
    assert out[0] == (10.0, 10.0)
    assert out[2] == (20.0, 35.0)          # halfway between 20 (h1) and 50 (h3)
    assert out[4] == (50.0, 60.0)          # 1/3 of 50->80 over h3..h6
    assert out[5] == (50.0, 70.0)
    assert out[6] == (80.0, 80.0)


def test_gapfill_envelope_is_null_and_null_sum_is_gap(spark):
    """A bucket observed with an all-NULL measure is a gap for the fill
    columns, and hours before the first / after the last non-null
    observation get NULL locf/interp respectively."""
    from datetime import datetime

    from rag_lakehouse_spark.operators.gapfill import gapfill, time_spine

    def h(i):
        return datetime(2024, 1, 1, i, 0, 0)

    raw = spark.createDataFrame(
        [("a", h(0), None), ("a", h(1), 30.0), ("a", h(2), None)],
        "k string, ts timestamp, value double",
    )
    observed = raw.groupBy("k", F.date_trunc("hour", "ts").alias("bucket")).agg(
        F.sum("value").alias("v")
    )
    spine = time_spine(raw, "ts", ["k"])
    out = {
        r["bucket"].hour: (r["locf_v"], r["interp_v"])
        for r in gapfill(spine, observed, ["k"]).collect()
    }
    assert out[0] == (None, None)          # before first observation
    assert out[1] == (30.0, 30.0)
    assert out[2] == (30.0, None)          # after last: locf carries, interp can't


def test_bucketed_interval_join_matches_naive(spark):
    """The dedup-free bucketed overlap join must equal the naive
    quadratic overlap join exactly — including intervals spanning many
    buckets, touching endpoints (half-open: no overlap), and identical
    intervals."""
    from rag_lakehouse_spark.operators.range_join import bucketed_interval_join

    left = spark.createDataFrame(
        [(1, 0, 100), (2, 50, 60), (3, 100, 200), (4, 995, 1005)],
        "l_id long, l_s long, l_e long",
    )
    right = spark.createDataFrame(
        [(10, 90, 110), (11, 60, 70), (12, 0, 1000), (13, 100, 100)],
        "r_id long, r_s long, r_e long",
    )
    got = {
        (r["l_id"], r["r_id"])
        for r in bucketed_interval_join(
            left, right, "l_s", "l_e", "r_s", "r_e", bucket_width=25
        ).collect()
    }
    naive = {
        (r["l_id"], r["r_id"])
        for r in left.join(
            right,
            (F.col("l_s") < F.col("r_e")) & (F.col("r_s") < F.col("l_e")),
        ).collect()
    }
    assert got == naive
    assert (1, 11) in got          # fully contained
    assert (3, 10) in got          # partial overlap
    assert (2, 11) not in got      # touching endpoints, half-open
    assert (4, 12) in got          # spans many buckets on the right side
