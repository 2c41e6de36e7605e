"""Hypothesis property tests for the chunkers.

Invariants fuzzed over adversarial text (unicode, empty, whitespace-
only, punctuation runs, shorter than one chunk):

- chunk_fixed: concatenating a doc's chunks in chunk_number order
  reconstructs the original text exactly (empty text → one empty
  chunk); every chunk but the last is exactly ``size`` chars; ids
  follow the ``{prefix}_{id}_chunk_{i}`` scheme; and the DuckDB oracle
  twin used by the registered query agrees cell-for-cell.
- chunk_sentences: chunks concatenated with single spaces contain the
  same non-whitespace character stream as the sentence split of the
  original (packing only regroups, never drops or invents); every
  chunk is non-empty; multi-sentence chunks respect max_chars.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rag_lakehouse_spark.operators.chunking import (
    WHITE_SPACE,
    chunk_fixed,
    chunk_sentences,
)

_char = st.characters(blacklist_categories=("Cs", "Cc", "Cn"), max_codepoint=0x2FFF)
# The whitespace chars engines/runtimes disagree about: \x0b (Java-\s
# yes / RE2-\s no), \xa0 and Unicode Zs (DuckDB-trim yes / Spark-trim
# no), \x1c..\x1f (Python-isspace yes / Unicode White_Space no) — plus
# sentence punctuation so boundaries land ON these chars.
_nasty = st.text(
    alphabet=["\x0b", "\x1c", "\x1d", "\xa0", "\u2009", "\u3000", "\x85",
              " ", "\t", ".", "!", "?", "a", "b"],
    max_size=20,
)
# Mix plain unicode with sentence-ish text so the sentence splitter
# sees real boundaries, not only degenerate one-sentence docs.
_sentencey = st.lists(
    st.text(alphabet=_char, max_size=25).map(lambda s: s + "."), max_size=6
).map(" ".join)
_texts = st.lists(
    st.one_of(st.text(alphabet=_char, max_size=60), _sentencey, _nasty),
    min_size=1,
    max_size=5,
)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# The registered chunk_fixed_docs oracle (plans/pipeline_queries.py),
# parameterized on chunk size, over a generic (doc_id, text) table.
_FIXED_ORACLE = """
SELECT doc_id,
       unnest(generate_series(0, (greatest(length(text),1)-1)//{size})) + 1
         AS chunk_number,
       'doc_' || doc_id || '_chunk_' ||
         unnest(generate_series(0, (greatest(length(text),1)-1)//{size}))
         AS chunk_id,
       unnest(list_transform(
           generate_series(0, (greatest(length(text),1)-1)//{size}),
           i -> substring(text, i*{size}+1, {size})))
         AS chunk_text
FROM t
"""


def _docs_df(spark, batch):
    return spark.createDataFrame(list(enumerate(batch)), "doc_id long, text string")


@settings(**_SETTINGS)
@given(batch=_texts, size=st.integers(min_value=1, max_value=30))
def test_chunk_fixed_reassembles_and_matches_oracle(spark, batch, size):
    rows = chunk_fixed(_docs_df(spark, batch), size=size).collect()

    got = sorted((r.doc_id, r.chunk_number, r.chunk_id, r.chunk_text) for r in rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(batch)))
    want = sorted(tuple(r) for r in con.execute(_FIXED_ORACLE.format(size=size)).fetchall())
    assert got == want

    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(range(len(batch)))  # empty text still yields a row
    for doc_id, doc_rows in by_doc.items():
        doc_rows.sort(key=lambda r: r.chunk_number)
        assert [r.chunk_number for r in doc_rows] == list(range(1, len(doc_rows) + 1))
        assert [r.chunk_id for r in doc_rows] == [
            f"doc_{doc_id}_chunk_{i}" for i in range(len(doc_rows))
        ]
        assert "".join(r.chunk_text for r in doc_rows) == batch[doc_id]
        for r in doc_rows[:-1]:
            assert len(r.chunk_text) == size


@settings(**_SETTINGS)
@given(batch=_texts, max_chars=st.integers(min_value=10, max_value=120))
def test_chunk_sentences_conserves_content(spark, batch, max_chars):
    import re

    rows = chunk_sentences(_docs_df(spark, batch), max_chars=max_chars).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)

    # The reference splitter mirrors the Spark expression EXACTLY:
    # explicit ASCII boundary class (never bare \s — Python's is
    # Unicode-aware) and the Unicode White_Space emptiness filter
    # (never bare .strip() — Python also strips \x1c..\x1f).
    def _stream(s: str) -> str:
        return "".join(c for c in s if c not in WHITE_SPACE)

    for doc_id, text in enumerate(batch):
        sents = [
            s
            for s in re.split(r"(?<=[.!?])[ \t\n\x0B\f\r]+", text)
            if s.strip(WHITE_SPACE)
        ]
        doc_rows = sorted(by_doc.get(doc_id, []), key=lambda r: r.chunk_number)
        if not sents:
            # Nothing survives the non-empty-sentence filter → no rows.
            assert doc_rows == []
            continue
        assert [r.chunk_number for r in doc_rows] == list(range(1, len(doc_rows) + 1))
        # Packing regroups sentences; single-space joins inside a chunk
        # mean the non-White_Space stream is conserved exactly.
        got_stream = "".join(_stream(r.chunk_text) for r in doc_rows)
        want_stream = "".join(_stream(s) for s in sents)
        assert got_stream == want_stream
        for r in doc_rows:
            assert r.chunk_text.strip(WHITE_SPACE) != ""


@settings(**_SETTINGS)
@given(batch=_texts)
def test_sentence_splitter_python_twin_matches_spark(spark, batch):
    """chunk_semantic's worker-side Python splitter and chunk_sentences'
    Java expression must produce the IDENTICAL sentence list — the
    \\s/White_Space divergence surface flagged in r7, locked here over
    the nasty-whitespace alphabet (\\x0b, \\x1c, \\xa0, U+2009, U+3000,
    \\x85 at and around sentence boundaries)."""
    import re

    df = _docs_df(spark, batch)
    sents_col = F.filter(
        F.split(F.col("text"), r"(?<=[.!?])[ \t\n\x0B\f\r]+"),
        lambda s: s.rlike(r"(?U)\S"),
    )
    got = {r.doc_id: r.s for r in df.select("doc_id", sents_col.alias("s")).collect()}
    for doc_id, text in enumerate(batch):
        want = [
            s
            for s in re.split(r"(?<=[.!?])[ \t\n\x0B\f\r]+", text)
            if s.strip(WHITE_SPACE)
        ]
        assert got[doc_id] == want, (doc_id, repr(text))


@settings(**_SETTINGS)
@given(
    batch=_texts,
    stride=st.integers(min_value=1, max_value=20),
    extra=st.integers(min_value=0, max_value=20),
)
def test_chunk_sliding_covers_and_reconstructs(spark, batch, stride, extra):
    """Sliding windows start at every stride multiple below the length,
    match Python slicing exactly, and concatenating each window's first
    `stride` chars (plus the full last window) rebuilds the text — the
    no-char-lost coverage guarantee overlap exists to provide."""
    from rag_lakehouse_spark.operators.chunking import chunk_sliding

    size = stride + extra
    rows = chunk_sliding(_docs_df(spark, batch), size=size, stride=stride).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in enumerate(batch):
        doc_rows = sorted(by_doc.get(doc_id, []), key=lambda r: r.chunk_number)
        n_expected = (max(len(text), 1) - 1) // stride + 1
        assert len(doc_rows) == n_expected
        expected = [text[i * stride : i * stride + size] for i in range(n_expected)]
        assert [r.chunk_text for r in doc_rows] == expected
        recon = "".join(c[:stride] for c in expected[:-1]) + expected[-1]
        assert recon == text
