"""Misra-Gries sketch guarantees, fuzzed: on arbitrary generated
streams, heavy_hitters_exact must equal the brute-force exact answer
(the sketch can only affect WORK, never the result), and the raw
sketch must retain every guaranteed-heavy item with bounded
undercount."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rag_lakehouse_spark.operators.heavy_hitters import (
    _mg_update,
    heavy_hitters_exact,
    merge_summaries,
    partition_summaries,
)

_items = st.lists(
    st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "h"]), min_size=1, max_size=60
)


@settings(max_examples=25, deadline=None)
@given(items=_items, k=st.integers(min_value=2, max_value=6))
def test_mg_sketch_guarantee_pure(items, k):
    counters: dict[str, int] = {}
    for it in items:
        _mg_update(counters, it, k)
    exact = Counter(items)
    n = len(items)
    assert len(counters) <= k
    for item, c in exact.items():
        if c > n / (k + 1):
            assert item in counters  # guaranteed-heavy items survive
    for item, est in counters.items():
        assert est <= exact[item]                 # never overcounts
        assert exact[item] - est <= n / (k + 1)   # bounded undercount


@settings(max_examples=15, deadline=None)
@given(
    a=_items, b=_items, k=st.integers(min_value=3, max_value=6)
)
def test_mg_merge_preserves_guarantee(a, b, k):
    ca: dict[str, int] = {}
    cb: dict[str, int] = {}
    for it in a:
        _mg_update(ca, it, k)
    for it in b:
        _mg_update(cb, it, k)
    merged = merge_summaries(list(ca.items()) + list(cb.items()), k)
    exact = Counter(a) + Counter(b)
    n = len(a) + len(b)
    assert len(merged) <= k
    for item, c in exact.items():
        # The Agarwal et al. mergeable-summaries bound: merged MG error
        # stays ≤ n/(k+1) over the COMBINED stream length — the tight
        # bound heavy_hitters_exact's candidate-completeness argument
        # depends on (ratio_den ≤ k+1 ⇒ no heavy item can be missed).
        if c > n / (k + 1):
            assert item in merged


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(items=st.lists(
    st.one_of(st.none(), st.sampled_from(["x", "y", "z", "w"])),
    min_size=1, max_size=40,
))
def test_heavy_hitters_exact_equals_bruteforce(spark, items):
    df = spark.createDataFrame([(i,) for i in items], "t string").repartition(3)
    got = {
        (r["item"], r["cnt"])
        for r in heavy_hitters_exact(df, "t", k=16, ratio_den=4).collect()
    }
    vals = [i for i in items if i is not None]
    exact = {
        (i, c) for i, c in Counter(vals).items() if c * 4 >= len(vals)
    }
    assert got == exact


def test_heavy_hitters_rejects_threshold_below_guarantee(spark):
    df = spark.createDataFrame([("a",)], "t string")
    with pytest.raises(ValueError):
        heavy_hitters_exact(df, "t", k=10, ratio_den=11)


def test_partition_summaries_bounded(spark):
    df = spark.range(0, 5000).selectExpr("CAST(id % 997 AS STRING) AS t").repartition(4)
    rows = partition_summaries(df, "t", 20).collect()
    assert len(rows) <= 4 * 20  # ≤ k counters per partition
