"""Hypothesis cross-engine property tests for the text-function layer.

Every Spark text primitive ships with a DuckDB twin used to build
oracles; any divergence between the pair silently corrupts a whole
query family (this is exactly how the short-text shingle bug slipped
through: hand-picked fixtures never included a sub-k document). These
tests fuzz the pair over generated strings — empty, whitespace-only,
punctuation-only, unicode, shorter than the shingle size — and demand
exact agreement.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rag_lakehouse_spark.functions import text as TX

# printable-ish unicode, no surrogates/control chars (parquet/duckdb-safe),
# biased short so sub-k shingle cases are common
_char = st.characters(
    blacklist_categories=("Cs", "Cc", "Cn"), max_codepoint=0x2FFF
)
_texts = st.lists(st.text(alphabet=_char, max_size=40), min_size=1, max_size=6)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _spark_rows(spark, batch, *cols):
    df = spark.createDataFrame(list(enumerate(batch)), "i long, text string")
    return {r.i: tuple(r[1:]) for r in df.select("i", *cols).collect()}


def _duck_rows(batch, select_sql):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(batch)))
    return {row[0]: tuple(row[1:]) for row in con.execute(select_sql).fetchall()}


@settings(**_SETTINGS)
@given(batch=_texts)
def test_normalize_fingerprint_cross_engine(spark, batch):
    got = _spark_rows(
        spark,
        batch,
        TX.normalized("text").alias("n"),
        TX.fingerprint("text").alias("fp"),
    )
    want = _duck_rows(
        batch,
        f"SELECT i, {TX.duckdb_normalized('text')}, {TX.duckdb_fingerprint('text')} FROM t",
    )
    assert got == want


@settings(**_SETTINGS)
@given(batch=_texts, k=st.integers(min_value=2, max_value=6))
def test_char_shingles_cross_engine(spark, batch, k):
    got = _spark_rows(
        spark, batch, F.array_sort(TX.char_shingles(TX.normalized("text"), k)).alias("sh")
    )
    want = _duck_rows(
        batch,
        f"SELECT i, list_sort({TX.duckdb_char_shingles(TX.duckdb_normalized('text'), k)}) FROM t",
    )
    got_n = {i: tuple(v[0]) for i, v in got.items()}
    want_n = {i: tuple(v[0]) for i, v in want.items()}
    assert got_n == want_n


@settings(**_SETTINGS)
@given(batch=_texts)
def test_tokens_cross_engine(spark, batch):
    got = _spark_rows(spark, batch, F.size(TX.tokens("text")).alias("n"))
    want = _duck_rows(batch, f"SELECT i, len({TX.duckdb_tokens('text')}) FROM t")
    assert got == want


@settings(**_SETTINGS)
@given(batch=_texts)
def test_rolling_hash_fold_cross_engine(spark, batch):
    """Order-sensitive polynomial fold (anagram-safe fingerprint) must
    produce identical int64 values in both engines."""
    norm = TX.normalized("text")
    chars = F.transform(
        F.sequence(F.lit(1), F.length(norm)),
        lambda i: F.ascii(F.substring(norm, i, F.lit(1))).cast("bigint"),
    )
    fold = F.aggregate(
        chars, F.lit(0).cast("bigint"), lambda acc, c: (acc * 131 + c) % 2147483647
    )
    # guard: F.sequence(1, 0) would yield [1, 0]; length 0 must fold to 0
    got = _spark_rows(
        spark, batch, F.when(F.length(norm) > 0, fold).otherwise(F.lit(0)).alias("h")
    )
    dn = TX.duckdb_normalized("text")
    want = _duck_rows(
        batch,
        f"""SELECT i, list_reduce(
                list_prepend(CAST(0 AS BIGINT),
                  list_transform(generate_series(1, length({dn})),
                                 j -> CAST(ascii(substring({dn}, j, 1)) AS BIGINT))),
                (acc, c) -> (acc * 131 + c) % 2147483647) FROM t""",
    )
    assert got == want


@settings(**_SETTINGS)
@given(batch=_texts, size=st.integers(min_value=1, max_value=9))
def test_chunk_fixed_cross_engine(spark, batch, size):
    """Fixed-size chunk expansion must agree with the DuckDB oracle
    formula for every text length — including empty and shorter-than-
    size documents (the oracle's greatest(length,1) edge)."""
    from rag_lakehouse_spark.operators.chunking import chunk_fixed

    df = spark.createDataFrame(list(enumerate(batch)), "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.chunk_number, r.chunk_id, r.chunk_text)
        for r in chunk_fixed(df, size=size, id_prefix="doc").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(batch)))
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
        SELECT doc_id,
               unnest(generate_series(0, (greatest(length(text),1)-1)//{size})) + 1,
               'doc_' || doc_id || '_chunk_' ||
                 unnest(generate_series(0, (greatest(length(text),1)-1)//{size})),
               unnest(list_transform(
                   generate_series(0, (greatest(length(text),1)-1)//{size}),
                   i -> substring(text, i*{size}+1, {size})))
        FROM t"""
        ).fetchall()
    )
    assert got == want


_vecs = st.integers(min_value=1, max_value=8).flatmap(
    lambda n: st.lists(
        st.tuples(
            st.lists(
                st.floats(
                    min_value=-100, max_value=100, allow_nan=False, width=32
                ),
                min_size=n,
                max_size=n,
            ),
            st.lists(
                st.floats(
                    min_value=-100, max_value=100, allow_nan=False, width=32
                ),
                min_size=n,
                max_size=n,
            ),
        ),
        min_size=1,
        max_size=5,
    )
)


@settings(**_SETTINGS)
@given(pairs=_vecs)
def test_vector_dot_fold_cross_engine(spark, pairs):
    """The strict left-fold dot product — the basis of every knn
    oracle — must be bit-identical across engines for arbitrary
    float32 vectors, including the list_sum-vs-fold question."""
    from rag_lakehouse_spark.functions import vector as VEC

    rows = [(i, a, b) for i, (a, b) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "i long, a array<float>, b array<float>")
    got = {r.i: r.d for r in df.select("i", VEC.dot("a", "b").alias("d")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, a FLOAT[], b FLOAT[])")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = dict(
        con.execute(f"SELECT i, {VEC.duckdb_dot('a', 'b')} FROM t").fetchall()
    )
    assert got == want


@settings(**_SETTINGS)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(max_codepoint=0x2FFF, blacklist_categories=("Cs", "Cn")),
            max_size=30,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_encoding_predicates_match_python_referee(spark, batch):
    """The encoding-health predicates (text_encoding_quality's
    detectors) vs pure-Python referees over fuzzed strings INCLUDING
    control characters (Cc deliberately allowed): the Java-regex
    semantics must agree with a character-level definition of each
    defect class."""
    import re as _re

    def ref_rep(s):
        return "\ufffd" in s

    _moj = _re.compile(
        "(\u00e2\u20ac|\u00c3[\u0080-\u00bf]|\u00c2[\u00a0-\u00bf])"
    )

    def ref_moj(s):
        return _moj.search(s) is not None

    def ref_ctl(s):
        return any("\x00" <= c <= "\x08" or "\x0e" <= c <= "\x1f" for c in s)

    got = _spark_rows(
        spark,
        batch,
        TX.has_replacement_char("text"),
        TX.has_mojibake_markers("text"),
        TX.has_raw_control_chars("text"),
    )
    for i, s in enumerate(batch):
        assert got[i] == (ref_rep(s), ref_moj(s), ref_ctl(s)), (i, repr(s))
