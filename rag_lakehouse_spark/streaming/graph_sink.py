"""Incremental NSW graph maintenance — the TWELFTH incremental-index
family, and the first whose maintained artifact is a NAVIGABLE GRAPH.

The NSW insertion rule (``plans/vector_queries.ann_graph_nsw_portable``)
is already a fold: each node's out-edges are its exact top-M cosine
neighbors among nodes inserted BEFORE it. The frozen build expresses
that as one triangular self-join over vec_id order; this sink replays
the SAME rule under continuous ingest — each micro-batch's vectors
join against the maintained vector set (plus in-batch prior ids),
their top-M forward edges append, and the state grows by
O(batch · M) edges + O(batch) vectors per fold. Provided batches
arrive in insertion (vec_id) order — the NSW contract; a file stream
over id-ranged files delivers exactly that — the maintained adjacency
is IDENTICAL to the frozen triangular build, so the serving walk runs
under the SAME unrolled-CTE oracle.

State: the fold-rewrite layout of ``streaming.rollup_sink`` (versioned
dirs + atomic CURRENT pointer + idempotency watermark + checkpoint
identity + ``compact_fold_state`` offline maintenance), one unified
table of 'vec' rows (vec_id, embedding, nrm) and 'edge' rows
(src, dst — forward edges only; the serving walk derives the
bidirectional back-edges by union at read, so the stored state stays
insert-append-only).

Scale: per-fold compute is |batch| × |state| scored pairs — the NSW
build cost itself, paid once per vector at ingest exactly like the
IVF sink's assignment cost (at corpus scale the candidate set comes
from the maintained graph's own beam search — classic NSW insertion —
or the LSH/IVF machinery; the exact scan here is the test-SF stand-in,
same argument as ``operators.graph_ann.knn_graph``). The fold-rewrite
write is O(state); an append-delta layout (``streaming.append_state``)
drops that to O(batch) — this family deliberately exercises the
fold-rewrite layout so ``compact_fold_state`` covers a graph-shaped
state too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rag_lakehouse_spark.functions import vector as VEC
from rag_lakehouse_spark.streaming.rollup_sink import (
    _ckpt_query_id,
    fold_batch,
    read_state,
)

NSW_M = 8  # out-degree, matching the frozen rung's _GN_M


def _nsw_vec_partials(batch_df: DataFrame) -> DataFrame:
    """A micro-batch as unified-state 'vec' rows. The norm is computed
    HERE, once per vector at ingest, with the same expression every
    serving path uses (``functions.vector.l2_norm``) — so maintained
    scores are bit-identical to batch scores."""
    return batch_df.select(
        F.lit("vec").alias("kind"),
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("embedding"),
        VEC.l2_norm("embedding").alias("nrm"),
        F.lit(None).cast("bigint").alias("src"),
        F.lit(None).cast("bigint").alias("dst"),
    )


def _nsw_merge(
    prev: DataFrame,
    batch_vecs: DataFrame,
    m: int = NSW_M,
    enforce_order: bool = False,
) -> DataFrame:
    """Fold one batch of 'vec' rows into the unified state: new forward
    edges are each batch vector's exact top-m cosine neighbors among
    (maintained ∪ in-batch) vectors with LOWER vec_id — the literal NSW
    insertion rule. Prior rows pass through untouched (insert-append
    semantics; nothing is re-aggregated).

    ``enforce_order`` (the ``maintain_nsw_index`` path sets it) fails
    FAST when a batch violates the id-order arrival contract — a
    lower id arriving after higher ids would silently build an
    adjacency that permanently differs from the frozen build (its
    top-m would miss the not-yet-arrived lower ids), detectable only
    as a later oracle mismatch with the state unrecoverable. Folding
    out of order WITHOUT the guard is still deterministic, legitimate
    NSW ("insertion order" = arrival order) — it just is not the
    frozen twin — which is why the guard is opt-in at the streaming
    entry point rather than baked into the merge.

    The maintained max vec_id rides in the state as the constant
    column ``max_vec_id`` (the ``last_batch_id`` watermark pattern),
    so the guard costs one limit-1 fetch of the constant plus one
    O(batch) min/max — never a re-scan of the whole state parquet
    per fold (r13 ADVICE)."""
    from rag_lakehouse_spark.operators.graph_ann import nsw_fwd_edges

    prev_max = None
    if "max_vec_id" in prev.columns:
        row = prev.select("max_vec_id").first()  # constant: limit-1
        prev_max = row[0] if row is not None else None
        prev = prev.drop("max_vec_id")
    prev_vecs = prev.filter(F.col("kind") == "vec").select(
        "vec_id", "embedding", "nrm"
    )
    new_vecs = batch_vecs.select("vec_id", "embedding", "nrm")
    bounds = new_vecs.agg(
        F.min("vec_id").alias("lo"), F.max("vec_id").alias("hi")
    ).first()
    batch_min = bounds["lo"] if bounds is not None else None
    batch_max = bounds["hi"] if bounds is not None else None
    if enforce_order:
        if (
            prev_max is not None
            and batch_min is not None
            and batch_min <= prev_max
        ):
            raise ValueError(
                f"NSW insertion-order contract violated: batch min "
                f"vec_id {batch_min} <= maintained max {prev_max}; the "
                "fold would silently diverge from the frozen build. "
                "Deliver batches in vec_id order (or rebuild)."
            )
    known = [x for x in (prev_max, batch_max) if x is not None]
    new_max = max(known) if known else None
    cand = prev_vecs.unionByName(new_vecs)
    # the SAME insert-order rule the frozen triangular build runs
    # (operators.graph_ann.nsw_fwd_edges) — batch as src, maintained ∪
    # in-batch as dst, so the two builds cannot drift
    fwd = nsw_fwd_edges(new_vecs, cand, m=m)
    edges = fwd.select(
        F.lit("edge").alias("kind"),
        F.lit(None).cast("bigint").alias("vec_id"),
        F.lit(None).cast(batch_vecs.schema["embedding"].dataType).alias(
            "embedding"
        ),
        F.lit(None).cast("double").alias("nrm"),
        "src",
        "dst",
    )
    return (
        prev.unionByName(batch_vecs)
        .unionByName(edges)
        .withColumn("max_vec_id", F.lit(new_max).cast("bigint"))
    )


def maintain_nsw_index(
    spark: SparkSession,
    emb_stream: DataFrame,
    state_path: str,
    m: int = NSW_M,
):
    """Start a foreachBatch query folding each micro-batch's vectors
    and their NSW forward edges into the versioned state at
    ``state_path``. Batches must arrive in insertion (vec_id) order —
    the NSW contract. Returns the StreamingQuery (caller awaits)."""
    ckpt = state_path + "_ckpt"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        fold_batch(
            spark,
            state_path,
            batch_df,
            batch_id,
            _ckpt_query_id(ckpt),
            partial_fn=_nsw_vec_partials,
            merge_fn=lambda prev, part: _nsw_merge(
                prev, part, m, enforce_order=True
            ),
        )

    return (
        emb_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def read_nsw_index(
    spark: SparkSession, state_path: str
) -> tuple[DataFrame, DataFrame]:
    """(vectors, graph) from the maintained state: vectors as
    (vec_id, embedding, nrm), graph as BIDIRECTIONAL (src, dst) —
    forward edges union their reversals, derived at read so the stored
    state stays append-only (exactly the frozen rung's serve shape)."""
    state = read_state(spark, state_path)
    if state is None:
        raise FileNotFoundError(f"no NSW index at {state_path}")
    vecs = state.filter(F.col("kind") == "vec").select(
        "vec_id", "embedding", "nrm"
    )
    fwd = state.filter(F.col("kind") == "edge").select("src", "dst")
    graph = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return vecs, graph
