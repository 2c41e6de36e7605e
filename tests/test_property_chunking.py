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

from rag_lakehouse_spark.operators.chunking import chunk_fixed, chunk_sentences

_char = st.characters(blacklist_categories=("Cs", "Cc", "Cn"), max_codepoint=0x2FFF)
# Mix plain unicode with sentence-ish text so the sentence splitter
# sees real boundaries, not only degenerate one-sentence docs.
_sentencey = st.lists(
    st.text(alphabet=_char, max_size=25).map(lambda s: s + "."), max_size=6
).map(" ".join)
_texts = st.lists(
    st.one_of(st.text(alphabet=_char, max_size=60), _sentencey),
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

    for doc_id, text in enumerate(batch):
        sents = [s for s in re.split(r"(?<=[.!?])\s+", text) if s.strip()]
        doc_rows = sorted(by_doc.get(doc_id, []), key=lambda r: r.chunk_number)
        if not sents:
            # Nothing survives the non-empty-sentence filter → no rows.
            assert doc_rows == []
            continue
        assert [r.chunk_number for r in doc_rows] == list(range(1, len(doc_rows) + 1))
        # Packing regroups sentences; single-space joins inside a chunk
        # mean the non-whitespace stream is conserved exactly.
        got_stream = "".join("".join(r.chunk_text.split()) for r in doc_rows)
        want_stream = "".join("".join(s.split()) for s in sents)
        assert got_stream == want_stream
        for r in doc_rows:
            assert r.chunk_text.strip() != ""
