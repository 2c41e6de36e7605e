"""Chunking invariants (FIXTURES.md §4): concatenating a document's
chunks in chunk_number order reproduces the source text; ids follow the
``{prefix}_{id}_chunk_{i}`` scheme; the semantic chunker is
deterministic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_lakehouse_spark.operators.chunking import (
    chunk_fixed,
    chunk_semantic,
    chunk_sentences,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "a" * 450),                       # 3 chunks of 200
            (2, "short"),                          # 1 chunk
            (3, ""),                               # empty text edge
            (4, "One sentence. Two sentences! Three? " * 10),
        ],
        "doc_id long, text string",
    )


def test_fixed_chunks_reassemble(docs, spark):
    chunks = chunk_fixed(docs, size=200)
    joined = (
        chunks.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_number", "chunk_text"))),
                    lambda x: x["chunk_text"],
                ),
                "",
            ).alias("rebuilt")
        )
    )
    src = {r.doc_id: r.text for r in docs.collect()}
    for r in joined.collect():
        assert r.rebuilt == src[r.doc_id]


def test_fixed_chunk_ids_and_numbers(docs):
    rows = chunk_fixed(docs, size=200).filter(F.col("doc_id") == 1).collect()
    assert [r.chunk_number for r in sorted(rows, key=lambda r: r.chunk_number)] == [1, 2, 3]
    assert {r.chunk_id for r in rows} == {"doc_1_chunk_0", "doc_1_chunk_1", "doc_1_chunk_2"}


def test_sentence_chunks_respect_budget(docs):
    rows = chunk_sentences(docs, max_chars=60).filter(F.col("doc_id") == 4).collect()
    assert len(rows) > 1
    # every chunk fits the budget (single oversized sentences excepted)
    assert all(len(r.chunk_text) <= 60 for r in rows)


def test_semantic_chunker_deterministic_and_complete(docs):
    a = chunk_semantic(docs).collect()
    b = chunk_semantic(docs).collect()
    key = lambda r: (r.doc_id, r.chunk_number)
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # chunk text concatenation contains every sentence of doc 4
    text4 = " ".join(
        r.chunk_text for r in sorted((r for r in a if r.doc_id == 4), key=key)
    )
    assert "One sentence." in text4 and "Three?" in text4
