"""Streaming incremental dedup indexes — online dedup against the full
ingestion history: an EXACT fingerprint index (streaming twin of
``plans.text_queries.dedup_exact_docs``) and a NEAR-dup MinHash
postings index (streaming twin of the LSH banding stage).

A training-data pipeline ingests continuously; batch re-dedup of the
whole corpus per increment is O(history) every time. Instead each
micro-batch folds its content fingerprints into a maintained
``(fingerprint, canonical_doc_id, n_copies)`` state table using the
same versioned-pointer two-phase commit, idempotency watermark, and
checkpoint-identity guard as the rollup sink
(``streaming.rollup_sink.fold_batch`` with dedup partial/merge fns).

Correctness argument: both maintained measures are mergeable —
``canonical_doc_id`` is a MIN (associative, commutative,
order-insensitive) and ``n_copies`` a SUM — so arrival order and batch
boundaries cannot change the result: the maintained index equals the
one-shot hash-groupBy over all rows ever ingested (asserted by the
``dedup_incremental_stream`` driver oracle and
tests/test_streaming_dedup.py).

Scale: each fold touches one micro-batch plus the index (one row per
DISTINCT document content — far smaller than the corpus under real
duplication rates); raw history is never re-scanned. The shuffle
carries 32-byte fingerprints + ids, never text — the same argument
that makes batch exact-dedup viable at 100 TB (dedup_exact_docs
docstring). At cluster scale the state table becomes a Delta/Iceberg
table (sources/lakehouse.py) and the fold a MERGE.

Reference parity: the reference dedups per run inside
``jobs/silver_transformation.py`` (drop_duplicates over the batch);
cross-run dedup against history is part of this repo's
training-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rag_lakehouse_spark.functions import text as TX
from rag_lakehouse_spark.streaming.rollup_sink import (
    _ckpt_query_id,
    fold_batch,
    read_state,
)


def _batch_fingerprints(df: DataFrame) -> DataFrame:
    """Micro-batch → mergeable dedup partials: one row per distinct
    content fingerprint with the batch-local canonical (min doc_id)
    and copy count."""
    return (
        df.select(TX.fingerprint("text").alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _merge_fingerprints(prev: DataFrame, batch: DataFrame) -> DataFrame:
    return (
        prev.unionByName(batch)
        .groupBy("fingerprint")
        .agg(
            F.min("canonical_doc_id").alias("canonical_doc_id"),
            F.sum("n_copies").cast("bigint").alias("n_copies"),
        )
    )


def maintain_dedup_index(
    spark: SparkSession, docs_stream: DataFrame, state_path: str
):
    """Start a foreachBatch query folding each micro-batch's content
    fingerprints into the dedup index at ``state_path``. Returns the
    StreamingQuery (caller awaits termination)."""
    ckpt = state_path + "_ckpt"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        fold_batch(
            spark,
            state_path,
            batch_df,
            batch_id,
            _ckpt_query_id(ckpt),
            partial_fn=_batch_fingerprints,
            merge_fn=_merge_fingerprints,
        )

    return (
        docs_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def read_dedup_index(spark: SparkSession, state_path: str) -> DataFrame:
    """The maintained index as a batch DataFrame:
    (fingerprint, canonical_doc_id, n_copies)."""
    state = read_state(spark, state_path)
    if state is None:
        raise FileNotFoundError(f"no dedup index at {state_path}")
    return state.select("fingerprint", "canonical_doc_id", "n_copies")


def _batch_band_keys(df: DataFrame) -> DataFrame:
    """Micro-batch → LSH band-key postings (doc_id, band_idx,
    band_key) over the portable hash family. The expensive part of
    near-dup detection — shingling + signature aggregation — runs
    exactly once per document, at ingest."""
    from rag_lakehouse_spark.operators.dedup_portable import portable_band_keys

    return portable_band_keys(df, text_col="text", id_col="doc_id")


def maintain_minhash_postings(
    spark: SparkSession, docs_stream: DataFrame, state_path: str
):
    """Start a foreachBatch query APPENDING each micro-batch's MinHash
    band-key postings as an immutable delta under ``state_path`` — the
    incremental half of near-dup detection: signatures are computed
    once per doc ever; new docs join against stored postings instead of
    re-shingling history. Returns the StreamingQuery.

    Append-only (``streaming.append_state``), not fold-rewrite: the
    postings merge is pure union (batches partition docs disjointly),
    and the index grows with the corpus — a fold that read+rewrote the
    whole index would pay O(index) I/O per micro-batch where the delta
    append pays O(batch). ``compact_state`` bounds file-count growth
    offline."""
    from rag_lakehouse_spark.streaming.append_state import append_delta

    ckpt = state_path + "_ckpt"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        append_delta(
            spark, state_path, _batch_band_keys(batch_df), batch_id,
            _ckpt_query_id(ckpt),
        )

    return (
        docs_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def near_pairs_from_postings(
    spark: SparkSession,
    state_path: str,
    corpus: DataFrame,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs from the maintained postings index: band
    equi-join over the state table → exact-Jaccard verify against the
    corpus (candidates only). Because the postings are exactly
    ``portable_band_keys`` rows, the result is bit-identical to the
    one-shot ``portable_minhash_pairs`` over the same corpus — which is
    what lets the incremental index be driver-oracled by the same SQL.

    Scale: the self-join input is the postings table (docs × BANDS
    short rows, no text); verification re-shingles only candidate
    docs. The corpus scan for verification is semi-join-pruned."""
    from rag_lakehouse_spark.operators.dedup_portable import pairs_from_band_keys
    from rag_lakehouse_spark.streaming.append_state import read_deltas

    state = read_deltas(spark, state_path)
    if state is None:
        raise FileNotFoundError(f"no postings index at {state_path}")
    banded = state.select("doc_id", "band_idx", "band_key").localCheckpoint(
        eager=True
    )  # barrier: both self-join sides read it
    return pairs_from_band_keys(
        corpus, banded, text_col="text", id_col="doc_id", threshold=threshold
    )


def flag_against_index(
    spark: SparkSession, state_path: str, incoming: DataFrame
) -> DataFrame:
    """Classify incoming docs against the maintained history: appends
    ``is_duplicate`` (content already in the index) and
    ``canonical_doc_id`` (the historical canonical, or the doc's own id
    for novel content). The serving-side read a pipeline calls BEFORE
    admitting new documents — a broadcast-or-shuffle equi-join on the
    32-byte fingerprint, never on text."""
    idx = read_dedup_index(spark, state_path)
    fp = incoming.withColumn("__fp", TX.fingerprint("text"))
    joined = fp.join(idx, fp["__fp"] == idx["fingerprint"], "left")
    # qualified refs throughout: an ``incoming`` that already carries a
    # fingerprint/canonical_doc_id column must not capture the index's
    return joined.select(
        *[incoming[c] for c in incoming.columns],
        idx["fingerprint"].isNotNull().alias("is_duplicate"),
        F.coalesce(idx["canonical_doc_id"], incoming["doc_id"]).alias(
            "canonical_doc_id"
        ),
    )
