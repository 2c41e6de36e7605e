"""Streaming incremental lexical-search index: maintain full-vocabulary
term postings ``(doc_id, term, tf)`` under continuous ingest and serve
BM25 from the maintained state — the search-family member of the
incremental-index story (exact dedup fingerprints, MinHash postings,
IVF assignments, and now term postings).

Each micro-batch tokenizes ONLY its own documents and appends its
postings as an immutable O(batch) delta (``streaming.append_state`` —
batches partition docs disjointly, so the merge is pure union and the
append layout applies; the corpus-sized index is never rewritten).
Document length is not stored separately: ``dl = SUM(tf)`` per doc over
the full vocabulary, exactly the one-shot tokenizer's ``size(tokens)``
(every doc emits ≥ 1 token — the NULL → single-empty-token contract),
so serving derives lengths from the same state table.

Correctness: postings rows equal the one-shot
``groupBy(doc, term).count()`` over all rows ever ingested (disjoint
union), so ``bm25_from_postings`` — which feeds them through the SAME
``bm25_from_stats`` arithmetic as the batch query — returns
bit-identical scores, letting ``rag_bm25_incremental`` share
``rag_bm25_topk``'s DuckDB oracle.

Scale: per-increment cost is one micro-batch tokenize + an O(batch)
delta write; history is never re-tokenized. The serving-side stats
(df, N, avgdl) are aggregates over the postings/lens relations —
at 100 TB these become maintained aggregates themselves (the
fold-rewrite layout, bounded by |vocabulary| and |docs|; see
docs/SCALE.md layout-choice rule), leaving serving cost at
|query terms| lookups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rag_lakehouse_spark.plans.search_queries import (
    QUERY_TERMS,
    _toks,
    bm25_from_stats,
)
from rag_lakehouse_spark.streaming.append_state import append_delta, read_deltas
from rag_lakehouse_spark.streaming.rollup_sink import _ckpt_query_id


def _batch_postings(df: DataFrame) -> DataFrame:
    """Micro-batch → (doc_id, term, tf) over the FULL vocabulary."""
    return (
        df.select(F.col("doc_id"), F.explode(_toks("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def maintain_term_postings(
    spark: SparkSession, docs_stream: DataFrame, state_path: str
):
    """Start a foreachBatch query appending each micro-batch's term
    postings as an immutable delta under ``state_path``. Returns the
    StreamingQuery (caller awaits termination)."""
    ckpt = state_path + "_ckpt"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        append_delta(
            spark, state_path, _batch_postings(batch_df), batch_id,
            _ckpt_query_id(ckpt),
        )

    return (
        docs_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def bm25_from_postings(
    spark: SparkSession,
    state_path: str,
    terms: tuple[str, ...] = QUERY_TERMS,
) -> DataFrame:
    """(doc_id, score) BM25 from the maintained postings index —
    bit-identical to ``bm25_scores`` over the same corpus."""
    state = read_deltas(spark, state_path)
    if state is None:
        raise FileNotFoundError(f"no postings index at {state_path}")
    postings = state.select("doc_id", "term", "tf").localCheckpoint(
        eager=True
    )  # consumed twice: tf relation + derived doc lengths
    lens = postings.groupBy("doc_id").agg(
        F.sum("tf").cast("int").alias("dl")  # matches size(tokens)'s int type
    )
    return bm25_from_stats(postings, lens, terms)


def heavy_terms_from_postings(
    spark: SparkSession, state_path: str, ratio_den: int = 200
) -> DataFrame:
    """Exact heavy terms (frequency ≥ n/ratio_den) served from the
    maintained postings index — under streaming ingest the heavy-hitter
    question needs NO sketch: term counts are mergeable, so the index
    already holds the aggregated state and serving is one bounded
    aggregate over it (the Misra-Gries pass in
    ``operators.heavy_hitters`` is for one-shot scans over UNindexed
    data). Empty-string tokens (the NULL-doc contract rows) are
    excluded. Integer threshold compare, no doubles."""
    state = read_deltas(spark, state_path)
    if state is None:
        raise FileNotFoundError(f"no postings index at {state_path}")
    counted = (
        state.filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.sum("tf").cast("bigint").alias("cnt"))
    )
    total = counted.agg(F.sum("cnt").alias("n"))
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * F.lit(ratio_den) >= F.col("n"))
        .select(F.col("term").alias("item"), "cnt")
    )
