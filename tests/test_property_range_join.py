"""Hypothesis property test for the bucketed range join: against
adversarial integer points/intervals (boundary hits, zero-length and
inverted intervals, negatives, far-apart magnitudes, duplicate
values), the quantized equi-join + residual must return EXACTLY the
pairs the naive non-equi join returns — for several bucket widths, for
both end-exclusive and end-inclusive semantics, and with an extra
equality key."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rag_lakehouse_spark.operators.range_join import bucketed_range_join

_vals = st.integers(min_value=-(10**6), max_value=10**6)
_points = st.lists(st.tuples(_vals, st.integers(0, 3)), min_size=0, max_size=12)
_intervals = st.lists(
    st.tuples(_vals, st.integers(min_value=0, max_value=10**5), st.integers(0, 3)),
    min_size=0,
    max_size=8,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(points=_points, intervals=_intervals,
       width=st.sampled_from([1, 7, 1000, 10**6]),
       inclusive=st.booleans())
def test_bucketed_range_join_equals_naive(spark, points, intervals, width, inclusive):
    p = spark.createDataFrame(
        [(i, t, k) for i, (t, k) in enumerate(points)] or [(0, None, None)],
        "pid long, t long, key int",
    ).filter(F.col("t").isNotNull())
    iv = spark.createDataFrame(
        [(i, lo, lo + ln, k) for i, (lo, ln, k) in enumerate(intervals)]
        or [(0, None, None, None)],
        "iid long, lo long, hi long, key int",
    ).filter(F.col("lo").isNotNull())

    got = bucketed_range_join(
        p, iv.withColumnRenamed("key", "ikey"), "t", "lo", "hi",
        bucket_width=width, end_inclusive=inclusive,
    )
    upper = F.col("t") <= F.col("hi") if inclusive else F.col("t") < F.col("hi")
    naive = p.join(
        iv.withColumnRenamed("key", "ikey"),
        (F.col("t") >= F.col("lo")) & upper,
    )
    assert sorted((r.pid, r.iid) for r in got.collect()) == sorted(
        (r.pid, r.iid) for r in naive.collect()
    )

    got_k = bucketed_range_join(
        p, iv, "t", "lo", "hi",
        bucket_width=width, end_inclusive=inclusive, extra_keys=("key",),
    )
    naive_k = p.join(
        iv.withColumnRenamed("key", "k2"),
        (F.col("t") >= F.col("lo")) & upper & (F.col("key") == F.col("k2")),
    )
    assert sorted((r.pid, r.iid) for r in got_k.collect()) == sorted(
        (r.pid, r.iid) for r in naive_k.collect()
    )
