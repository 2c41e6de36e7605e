"""Streaming incremental dedup index == batch exact dedup.

Documents replay through an availableNow file stream one file per
trigger; each micro-batch folds content fingerprints into the stored
index. The maintained index must equal the one-shot hash-groupBy over
all rows (MIN canonical and SUM copies are mergeable, so batch
boundaries cannot matter), and serving-side classification must see
cross-batch history. The versioning/idempotency machinery itself is
locked by tests/test_streaming_rollup.py — these tests cover the dedup
partials and the serving read.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_lakehouse_spark.functions import text as TX
from rag_lakehouse_spark.sources.tables import load_table
from rag_lakehouse_spark.streaming.dedup_sink import (
    _batch_fingerprints,
    _merge_fingerprints,
    flag_against_index,
    maintain_dedup_index,
    read_dedup_index,
)
from rag_lakehouse_spark.streaming.rollup_sink import fold_batch


@pytest.fixture(scope="module")
def docs_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("docs_dedup_stream"))
    # 4 files → 4 micro-batches under maxFilesPerTrigger=1
    load_table(spark, sf_dir, "documents").select("doc_id", "text").repartition(
        4
    ).write.mode("overwrite").parquet(out)
    return out


def test_incremental_index_matches_batch_dedup(spark, docs_dir, tmp_path_factory):
    state = str(tmp_path_factory.mktemp("dedup_state")) + "/index"
    stream = (
        spark.readStream.schema(spark.read.parquet(docs_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    q = maintain_dedup_index(spark, stream, state)
    q.awaitTermination()
    assert q.lastProgress is not None and q.lastProgress["batchId"] >= 3

    got = {
        r.fingerprint: (r.canonical_doc_id, r.n_copies)
        for r in read_dedup_index(spark, state).collect()
    }
    want = {
        r.fingerprint: (r.canonical_doc_id, r.n_copies)
        for r in spark.read.parquet(docs_dir)
        .select(TX.fingerprint("text").alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .collect()
    }
    assert got == want


def test_cross_batch_duplicate_gets_historical_canonical(spark, tmp_path_factory):
    """A doc arriving in a LATER batch whose content already exists in
    the index must fold into the historical fingerprint row, keeping
    the earlier (smaller) canonical id — online dedup against history,
    not per-batch dedup."""
    state = str(tmp_path_factory.mktemp("dedup_fold")) + "/index"
    b0 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    b1 = spark.createDataFrame(
        [(9, "alpha beta"), (10, "epsilon zeta")], "doc_id long, text string"
    )
    for i, b in enumerate([b0, b1]):
        assert fold_batch(
            spark, state, b, i,
            partial_fn=_batch_fingerprints, merge_fn=_merge_fingerprints,
        )
    idx = {
        r.canonical_doc_id: r.n_copies
        for r in read_dedup_index(spark, state).collect()
    }
    assert idx == {1: 2, 2: 1, 10: 1}  # doc 9 folded under canonical 1

    incoming = spark.createDataFrame(
        [(42, "ALPHA---beta"), (43, "brand new content")],
        "doc_id long, text string",
    )
    flags = {
        r.doc_id: (r.is_duplicate, r.canonical_doc_id)
        for r in flag_against_index(spark, state, incoming).collect()
    }
    # normalization folds case/punct → 42 duplicates history, 43 is novel
    assert flags == {42: (True, 1), 43: (False, 43)}


def test_incremental_postings_pairs_equal_batch_pairs(spark, tmp_path_factory):
    """Postings folded across two batches must yield the same verified
    near-dup pairs as the one-shot portable MinHash pipeline over the
    combined corpus — the maintained index is just the banding rows."""
    from rag_lakehouse_spark.operators.dedup_portable import portable_minhash_pairs
    from rag_lakehouse_spark.streaming.append_state import append_delta
    from rag_lakehouse_spark.streaming.dedup_sink import (
        _batch_band_keys,
        near_pairs_from_postings,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep dark woods tonight while stars shine overhead"
    )
    b0 = spark.createDataFrame(
        [(1, base), (2, "completely unrelated text about query optimizers and shuffles in distributed engines")],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(9, base.replace("tonight", "today"))],  # near-dup of doc 1, later batch
        "doc_id long, text string",
    )
    state = str(tmp_path_factory.mktemp("postings")) + "/index"
    for i, b in enumerate([b0, b1]):
        assert append_delta(spark, state, _batch_band_keys(b), i)
    corpus = b0.unionByName(b1)
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in near_pairs_from_postings(spark, state, corpus, threshold=0.3).collect()
    }
    want = {
        (r.id_a, r.id_b): r.jaccard
        for r in portable_minhash_pairs(corpus, threshold=0.3).collect()
    }
    assert got == want
    assert (1, 9) in got  # the cross-batch near-dup is found


# r16 (VERDICT r15 #2): long referee family - excluded from the
# default fast run; seal runs use -m "slow or not slow".
pytestmark = pytest.mark.slow
