"""Portable Bloom filter (operators.bloom): the Spark-built bitmap and
the map-only probe expression must agree bit-for-bit with a plain
Python big-int model of the same arithmetic, and membership must never
be missed (a Bloom filter's structural no-false-negative guarantee).
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rag_lakehouse_spark.operators.bloom import (
    BLOOM_AB,
    M_BITS,
    N_WORDS,
    bloom_build,
    bloom_probe,
)

_P60 = 1 << 60


def _model_positions(key: int) -> list[int]:
    h = int(hashlib.md5(f"bloom:{key}".encode()).hexdigest()[:15], 16)
    return [((a * h + b) % _P60) >> 48 for a, b in BLOOM_AB]


def _model_build(keys: list[int]) -> list[int]:
    words = [0] * N_WORDS
    for k in keys:
        for pos in _model_positions(k):
            words[pos >> 5] |= 1 << (pos & 31)
    return words


def _model_probe(words: list[int], key: int) -> bool:
    return all(
        (words[pos >> 5] >> (pos & 31)) & 1 for pos in _model_positions(key)
    )


_keys = st.lists(
    st.integers(min_value=0, max_value=1 << 40), min_size=1, max_size=30, unique=True
)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(keys=_keys, probes=_keys)
def test_bloom_build_and_probe_match_python_model(spark, keys, probes):
    kdf = spark.createDataFrame([(k,) for k in keys], "key long")
    words = bloom_build(kdf, "key")
    assert words == _model_build(keys)
    assert all(0 <= w < (1 << 32) for w in words)  # bit 31 is the highest used

    pdf = spark.createDataFrame([(p,) for p in set(probes) | set(keys)], "key long")
    got = {
        r["key"]: r["pass"]
        for r in pdf.select(
            "key", bloom_probe(words, F.col("key")).alias("pass")
        ).collect()
    }
    for key, passed in got.items():
        assert passed == _model_probe(words, key)
        if key in set(keys):  # no false negatives, ever
            assert passed


def test_bloom_positions_in_range(spark):
    kdf = spark.createDataFrame([(k,) for k in range(200)], "key long")
    words = bloom_build(kdf, "key")
    assert len(words) == N_WORDS
    # 200 keys * 4 probes can never set more bits than positions drawn
    assert 1 <= sum(bin(w).count("1") for w in words) <= 200 * len(BLOOM_AB)
    assert M_BITS == N_WORDS * 32


def test_bloom_fold_equals_batch_and_tolerates_overlap(spark, sf_dir, tmp_path_factory):
    """OR is idempotent: OVERLAPPING micro-batches folded through the
    versioned state must still equal the one-shot bitmap; a replayed
    batch id is a no-op."""
    from rag_lakehouse_spark.sources.tables import load_table
    from rag_lakehouse_spark.streaming.rollup_sink import (
        _bloom_merge,
        _bloom_partials,
        fold_batch,
        read_bloom_words,
    )

    keys = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey")
    )
    state = str(tmp_path_factory.mktemp("bloom_state")) + "/words"
    b0 = keys.filter(F.col("c_custkey") % 2 == 0)
    b1 = keys.filter(  # overlaps b0 on %4==0 — OR must not care
        (F.col("c_custkey") % 2 == 1) | (F.col("c_custkey") % 4 == 0)
    )
    for bid, b in ((0, b0), (1, b1)):
        assert fold_batch(
            spark, state, b, bid, "ckpt-test",
            partial_fn=_bloom_partials, merge_fn=_bloom_merge,
        )
    assert not fold_batch(
        spark, state, b1, 1, "ckpt-test",
        partial_fn=_bloom_partials, merge_fn=_bloom_merge,
    )
    dense = [0] * N_WORDS
    for r in read_bloom_words(spark, state).collect():
        dense[r["word"]] = r["w"]
    assert dense == bloom_build(keys, "c_custkey")
