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
