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

from rag_lakehouse_spark.operators.range_join import bucketed_range_join, epoch_micros

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


# DST-transition instants (epoch micros) — the cast inside epoch_micros
# is timezone-sensitive by contract (session pinned UTC), so these are
# the instants where a tz-handling bug would show as a ±1h shift.
_DST_ADJACENT = [
    1_616_893_200_000_000,  # 2021-03-28T01:00:00Z — EU spring-forward
    1_635_642_000_000_000,  # 2021-10-31T01:00:00Z — EU fall-back
    1_615_712_400_000_000,  # 2021-03-14T07:00:00Z — US spring-forward
    1_636_264_800_000_000,  # 2021-11-07T06:00:00Z — US fall-back
]
_micros = st.one_of(
    # 1900-01-01 .. 2100-01-01, any sub-second offset
    st.integers(min_value=-2_208_988_800_000_000, max_value=4_102_444_800_000_000),
    st.sampled_from(
        [m + d for m in _DST_ADJACENT for d in (-1, 0, 1, -500_000, 500_000)]
    ),
)


@settings(**_SETTINGS)
@given(micros=st.lists(_micros, min_size=1, max_size=16))
def test_epoch_micros_total_over_timestamp_flavors(spark, micros):
    """epoch_micros must be the exact inverse of timestamp_micros for
    BOTH flavors the parquet loader can produce: TIMESTAMP (instant)
    and TIMESTAMP_NTZ (wall clock, relabeled under the pinned-UTC
    session tz). Locks the r6 NTZ totality fix (operators/range_join.py
    cast) against sub-second offsets and DST-adjacent instants."""
    df = spark.createDataFrame(list(enumerate(micros)), "i long, m long")
    out = df.select(
        "m",
        epoch_micros(F.timestamp_micros(F.col("m"))).alias("via_ts"),
        epoch_micros(
            F.timestamp_micros(F.col("m")).cast("timestamp_ntz")
        ).alias("via_ntz"),
    ).collect()
    for r in out:
        assert r.via_ts == r.m
        assert r.via_ntz == r.m  # UTC session: the NTZ relabel is lossless
