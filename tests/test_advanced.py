"""Advanced-operator tests: vectorized knn vs exact expression path,
as-of tolerance semantics, approximate-aggregate error bounds."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from rag_lakehouse_spark.operators.asof import asof_join_backward
from rag_lakehouse_spark.operators.similarity import knn_exact, knn_exact_vectorized
from rag_lakehouse_spark.sources.tables import load_table


def test_vectorized_knn_agrees_with_exact(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    corpus = e.filter(F.col("vec_id") >= 10)
    exact = {
        (r.query_id, r.rank): r.neighbor_id for r in knn_exact(corpus, q, k=5).collect()
    }
    fast = {
        (r.query_id, r.rank): r.neighbor_id
        for r in knn_exact_vectorized(corpus, q, k=5).collect()
    }
    assert exact == fast


def test_asof_tolerance_voids_stale_matches(spark):
    ts = lambda s: datetime.fromisoformat(s)
    left = spark.createDataFrame(
        [(1, 100, ts("2024-01-01T10:00:00")), (2, 100, ts("2024-01-01T12:00:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(50, 100, ts("2024-01-01T09:59:00"), 5.0)],
        "p_id long, user_id long, ts timestamp, value double",
    )
    out = asof_join_backward(
        left, right, by="user_id", payload_cols=("p_id", "value"), tolerance_seconds=3600
    )
    rows = {r.event_id: r for r in out.collect()}
    assert rows[1].right_p_id == 50          # 1 min old → within tolerance
    assert rows[2].right_p_id is None        # 2h 1min old → voided


def test_asof_no_right_rows_yields_nulls(spark):
    ts = lambda s: datetime.fromisoformat(s)
    left = spark.createDataFrame(
        [(1, 7, ts("2024-01-01T10:00:00"))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [], "p_id long, user_id long, ts timestamp, value double"
    )
    out = asof_join_backward(left, right, by="user_id", payload_cols=("p_id", "value"))
    r = out.collect()[0]
    assert r.event_id == 1 and r.right_p_id is None and r.right_value is None


def test_approx_distinct_within_bounds(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.countDistinct("l_orderkey").alias("o"), F.countDistinct("l_partkey").alias("p")
    ).collect()[0]
    approx = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("o"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("p"),
    ).collect()[0]
    assert abs(approx.o - exact.o) / exact.o < 0.1
    assert abs(approx.p - exact.p) / exact.p < 0.1


def test_hll_union_registers_mergeable(spark):
    """The set-algebra identity behind events_hll_union_portable: the
    element-wise MAX of two sets' register vectors must equal the
    registers computed from the concatenated raw rows — i.e. the union
    estimate never needs a second pass over the data. Also pins the
    inclusion-exclusion arithmetic against a direct union estimate."""
    from rag_lakehouse_spark.plans.advanced_queries import (
        hll_estimates,
        hll_register_rows,
    )

    a = spark.createDataFrame(
        [("a", i) for i in range(40)], "event_type string, user_id long"
    )
    b = spark.createDataFrame(
        [("b", i) for i in range(25, 90)], "event_type string, user_id long"
    )
    regs = (
        hll_register_rows(a.unionByName(b))
        .groupBy("event_type", "idx")
        .agg(F.max("rho").alias("reg_max"))
    )
    merged = (
        regs.groupBy("idx")
        .agg(F.max("reg_max").alias("reg_max"))
        .select(F.lit("u").alias("event_type"), "idx", "reg_max")
    )
    direct = (
        hll_register_rows(
            a.unionByName(b).withColumn("event_type", F.lit("u"))
        )
        .groupBy("event_type", "idx")
        .agg(F.max("rho").alias("reg_max"))
    )
    m_rows = {(r.idx, r.reg_max) for r in merged.collect()}
    d_rows = {(r.idx, r.reg_max) for r in direct.collect()}
    assert m_rows == d_rows  # max-merge == recompute-from-raw
    est = {
        r.event_type: r.est_distinct
        for r in hll_estimates(regs.unionByName(merged)).collect()
    }
    assert est["u"] == pytest.approx(90, rel=0.25)
    # inclusion-exclusion intersection ~ |25..39| = 15 (loose: error
    # amplifies on small overlaps — the documented caveat)
    inter = est["a"] + est["b"] - est["u"]
    assert 0 < inter < 40
