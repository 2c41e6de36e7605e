"""Streaming incremental MEDIA-METADATA index: each micro-batch of
binary media rows is header-parsed ONCE (``operators.multimodal.
media_metadata`` — the mapInPandas codec seam) and appended as an
immutable O(batch) delta (``streaming.append_state``); readers union
committed deltas. History is never re-decoded — the amortization a
continuously-ingesting multimodal pipeline needs at 100 TB, where
re-parsing stored media per batch would dwarf the ingest itself.

Append-only (not fold-rewrite) is the correct layout here by the r7
rule: batches partition media ids disjointly, so the merge is pure
union and the index grows with the corpus; ``compact_state`` bounds
file-count growth offline. Same replay-idempotence, CKPT_ID identity,
and crash-atomicity contracts as the dedup/vector/search sinks
(tests/test_append_state.py).

Fifth member of the incremental-index family: exact dedup, MinHash
postings, IVF assignments, BM25 term postings, media metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rag_lakehouse_spark.operators.multimodal import media_metadata
from rag_lakehouse_spark.streaming.append_state import append_delta, read_deltas
from rag_lakehouse_spark.streaming.rollup_sink import _ckpt_query_id


def maintain_media_index(
    spark: SparkSession, media_stream: DataFrame, state_path: str
):
    """Start a foreachBatch query appending each micro-batch's parsed
    media metadata as an immutable delta under ``state_path``. The
    stream carries (media_id, content); bytes never leave the executor
    and never enter the state — only the typed metadata rows do.
    Returns the StreamingQuery."""
    ckpt = state_path + "_ckpt"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        append_delta(
            spark,
            state_path,
            media_metadata(batch_df),
            batch_id,
            _ckpt_query_id(ckpt),
        )

    return (
        media_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def read_media_index(spark: SparkSession, state_path: str) -> DataFrame:
    """The maintained metadata table: union of committed deltas (plus
    the compacted base, if ``compact_state`` ran)."""
    return read_deltas(spark, state_path)


def _warc_host_partials(batch_df: DataFrame) -> DataFrame:
    """Micro-batch of (media_id, content) WARC blobs → per-host
    counter partials via the SAME walk the batch report aggregates
    (``operators.multimodal.warc_response_rows`` — one framing
    definition, so batch and maintained counters cannot diverge).
    Bytes are parsed ONCE per ingest and never enter the state."""
    from pyspark.sql import functions as F

    from rag_lakehouse_spark.operators.multimodal import warc_response_rows

    rows = warc_response_rows(batch_df)
    return rows.groupBy("host").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_responses"),
        F.sum(F.when(F.col("status") == 200, 1).otherwise(0))
        .cast("bigint")
        .alias("n_ok"),
        F.sum("body_bytes").cast("bigint").alias("total_body_bytes"),
        F.count_distinct("media_id").cast("bigint").alias("n_archives"),
    )


def _warc_host_merge(prev: DataFrame, batch: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return (
        prev.unionByName(batch)
        .groupBy("host")
        .agg(
            *[
                F.sum(c).cast("bigint").alias(c)
                for c in (
                    "n_responses",
                    "n_ok",
                    "total_body_bytes",
                    "n_archives",
                )
            ]
        )
    )


def maintain_warc_host_counters(
    spark: SparkSession, warc_stream: DataFrame, state_path: str
):
    """Fold each micro-batch's per-host WARC response counters into
    the versioned fold state — the ELEVENTH incremental-index family,
    and the first whose per-batch work is a real CODEC walk (the
    parse-once ingest shape: archives are walked when they arrive,
    never re-walked from history). Counter SUMS are mergeable; the
    fold watermark makes at-least-once replay exactly-once (SUM merge
    class). ``n_archives`` is additive because the file stream
    partitions archive ids disjointly across batches — the same
    disjointness contract the append-layout media index relies on.
    State is bounded at |hosts| rows regardless of crawl size."""
    from rag_lakehouse_spark.streaming.rollup_sink import fold_batch

    ckpt = state_path + "_ckpt"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        fold_batch(
            spark,
            state_path,
            batch_df,
            batch_id,
            _ckpt_query_id(ckpt),
            partial_fn=_warc_host_partials,
            merge_fn=_warc_host_merge,
        )

    return (
        warc_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def read_warc_host_counters(spark: SparkSession, state_path: str) -> DataFrame:
    """The maintained per-host counters as a batch DataFrame."""
    from rag_lakehouse_spark.streaming.rollup_sink import read_state

    state = read_state(spark, state_path)
    if state is None:
        raise FileNotFoundError(f"no WARC host state at {state_path}")
    return state.select(
        "host", "n_responses", "n_ok", "total_body_bytes", "n_archives"
    )
