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


def test_incremental_embed_touches_only_changed_chunks(spark):
    """Refresh must reuse stored vectors for unchanged chunks, embed new
    and changed ones, and drop deleted ones. Proven by refreshing with a
    DIFFERENT embedder: unchanged rows keep their v1 vectors (reuse),
    touched rows get v2-marker vectors (re-embedded)."""
    import numpy as np

    from rag_lakehouse_spark.operators.embedding import pseudo_embed_udf
    from rag_lakehouse_spark.pipeline import incremental_embed

    schema = "chunk_id string, chunk_text string, book_id string"
    v1 = spark.createDataFrame(
        [("c1", "alpha text", "b1"), ("c2", "beta text", "b1"), ("c3", "gamma text", "b2")],
        schema,
    )
    index_v1 = v1.withColumn("embedding", pseudo_embed_udf()(F.col("chunk_text")))
    index_v1.cache().count()

    v2 = spark.createDataFrame(
        [
            ("c1", "alpha text", "b1"),        # unchanged → reuse
            ("c2", "beta text EDITED", "b1"),  # changed → re-embed
            ("c4", "delta text", "b3"),        # new → embed
            # c3 deleted
        ],
        schema,
    )

    # marker embedder: constant vector, trivially distinguishable from v1
    from pyspark.sql import types as T

    @F.udf(T.ArrayType(T.FloatType()))
    def marker(_):
        return [9.0] * 4

    out = {r.chunk_id: r for r in incremental_embed(index_v1, v2, embed_udf=marker).collect()}
    assert set(out) == {"c1", "c2", "c4"}  # c3 dropped
    v1_vecs = {r.chunk_id: r.embedding for r in index_v1.collect()}
    assert np.allclose(out["c1"].embedding, v1_vecs["c1"])  # reused, not re-embedded
    assert out["c2"].embedding == [9.0] * 4  # changed → marker embedder ran
    assert out["c4"].embedding == [9.0] * 4  # new → marker embedder ran


# r16 (VERDICT r15 #2): long referee family - excluded from the
# default fast run; seal runs use -m "slow or not slow".
pytestmark = pytest.mark.slow
