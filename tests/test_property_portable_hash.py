"""Hypothesis cross-engine property tests for the portable hash family
(operators.dedup_portable): base60 (md5 hex → int64) and the affine
one-permutation transforms must agree bit-for-bit between Spark, DuckDB,
and a plain-Python big-int model. The affine decomposition exists
precisely to dodge int64 overflow — so fuzz it at the boundaries
(h near 0 and near 2^60-1), where a naive (a*h+b) % 2^60 would differ
or raise under ANSI.
"""

from __future__ import annotations

import hashlib

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rag_lakehouse_spark.operators.dedup_portable import (
    _PARAMS,
    _P60,
    affine60,
    base60,
    duckdb_affine60,
    duckdb_base60,
)

_char = st.characters(blacklist_categories=("Cs", "Cc", "Cn"), max_codepoint=0x2FFF)
_texts = st.lists(st.text(alphabet=_char, max_size=40), min_size=1, max_size=6)
_h60 = st.one_of(
    st.integers(min_value=0, max_value=_P60 - 1),
    st.sampled_from([0, 1, _P60 - 1, _P60 // 2, (1 << 30) - 1, 1 << 30]),
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@settings(**_SETTINGS)
@given(batch=_texts)
def test_base60_cross_engine_and_python_model(spark, batch):
    got = {
        r.i: r.h
        for r in spark.createDataFrame(
            list(enumerate(batch)), "i long, text string"
        ).select("i", base60(F.col("text")).alias("h")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(batch)))
    duck = dict(con.execute(f"SELECT i, {duckdb_base60('text')} FROM t").fetchall())
    model = {
        i: int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        for i, t in enumerate(batch)
    }
    assert got == duck == model


@settings(**_SETTINGS)
@given(hs=st.lists(_h60, min_size=1, max_size=8), seed=st.integers(0, len(_PARAMS) - 1))
def test_affine60_cross_engine_and_python_model(spark, hs, seed):
    a, b = _PARAMS[seed]
    got = {
        r.i: r.t
        for r in spark.createDataFrame(list(enumerate(hs)), "i long, h long")
        .select("i", affine60(F.col("h"), a, b).alias("t"))
        .collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, h BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(hs)))
    duck = dict(con.execute(f"SELECT i, {duckdb_affine60('h', a, b)} FROM t").fetchall())
    model = {i: (a * h + b) % _P60 for i, h in enumerate(hs)}
    assert got == duck == model
