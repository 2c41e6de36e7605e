"""End-to-end DAG parity: raw books JSON → medallion zones → chunked +
embedded index → retrieval with context assembly and attribution."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from rag_lakehouse_spark.pipeline import SEPARATOR, ask, build_index
from tests.test_medallion import RAW_BOOKS


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    raw_dir = tmp_path_factory.mktemp("raw")
    books = RAW_BOOKS + [
        {
            "title_xpath": f"Filler Book {i}",
            "price_xpath": f"£{10+i}.00",
            "availability_xpaths": f"In stock ({i+1} available)",
            "description_xpaths": "Padding description " * 30,
            "category_xpath": "Filler",
            "review_count_xpath": str(i),
            "book_url": f"https://example.test/filler-{i}/index.html",
            "id": f"f{i}",
            "scraped_at": "2026-08-13 11:00:00",
        }
        for i in range(10)
    ]
    for i, rec in enumerate(books):
        (raw_dir / f"{i}.json").write_text(json.dumps(rec))
    base = str(tmp_path_factory.mktemp("lake"))
    index = build_index(spark, str(raw_dir), base, run_id="e2e-run")
    return index


def test_index_structure(lake):
    assert lake.count() > 12  # filler descriptions chunk into multiples
    assert {"chunk_id", "book_id", "chunk_number", "chunk_text", "embedding"} <= set(
        lake.columns
    )
    assert lake.filter(F.size("embedding") != 64).count() == 0
    # chunk ids follow the reference scheme
    assert lake.filter(~F.col("chunk_id").rlike("^book_.+_chunk_\\d+$")).count() == 0
    # denormalized parent metadata present on every chunk
    assert lake.filter(F.col("book_url").isNull()).count() == 0


def test_ask_returns_context_and_source(spark, lake):
    out = ask(spark, lake, ["poetry classic collection", "mystery"], k=3)
    rows = {r.question: r for r in out.collect()}
    assert len(rows) == 2
    for r in rows.values():
        assert r.source.startswith("https://")
        assert len(r.context.split(SEPARATOR)) == 3  # k chunks assembled


def test_ask_deterministic(spark, lake):
    a = ask(spark, lake, ["poetry"], k=2).collect()
    b = ask(spark, lake, ["poetry"], k=2).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
