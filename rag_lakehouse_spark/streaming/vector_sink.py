"""Streaming incremental vector index — IVF cell assignments maintained
under continuous embedding ingest, the streaming twin of the assignment
half of ``operators.similarity.knn_ivf``.

The expensive per-vector work of an IVF index — nearest-centroid
assignment — happens exactly once per vector, at ingest: each
micro-batch assigns its vectors against a FROZEN coarse quantizer and
appends ``(vec_id, embedding, cell_id)`` rows as an immutable delta
(``streaming.append_state``: O(batch) I/O per fold — never a rewrite
of the corpus-sized index — idempotent per-batch dirs, a checkpoint-
identity guard, offline compaction). Serving reads run
``operators.similarity.ivf_search`` over the maintained table —
identical expressions to the batch path, so identical floats and
identical results given identical assignments (locked by
tests/test_streaming_vector.py).

Centroid contract: the quantizer is a frozen INPUT (trained once on an
initial sample — ``similarity.kmeans_centroids`` — or the deterministic
stratified sample), exactly how production IVF systems handle
continuous ingest; re-training the quantizer is an index REBUILD, not a
fold. Assignments are per-row pure functions of (vector, centroids), so
arrival order and batch boundaries cannot change the maintained table.

Scale: per-increment cost is one micro-batch × n_cells dot products
plus one delta write; search touches n_probe/n_cells of the data. At
cluster scale the state table is a Delta/Iceberg table partitioned by
cell_id, which also makes the search join partition-pruned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rag_lakehouse_spark.operators.similarity import _assign_cells, ivf_search
from rag_lakehouse_spark.streaming.rollup_sink import _ckpt_query_id


def maintain_vector_index(
    spark: SparkSession,
    emb_stream: DataFrame,
    state_path: str,
    centroids_df: DataFrame,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
):
    """Start a foreachBatch query folding each micro-batch's
    nearest-centroid assignments into the index at ``state_path``.
    ``centroids_df`` (cell_id, centroid) is the frozen quantizer.
    Returns the StreamingQuery (caller awaits termination)."""
    from rag_lakehouse_spark.streaming.append_state import append_delta

    ckpt = state_path + "_ckpt"
    # Materialize the (tiny) quantizer once — every fold closure reads
    # it, and a lazy plan would re-derive it per micro-batch.
    frozen = centroids_df.localCheckpoint(eager=True)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        assigned = _assign_cells(batch_df, frozen, vec_id, vec_col).select(
            vec_id, vec_col, "cell_id"
        )
        # append-only deltas (streaming.append_state): assignments merge
        # by pure union and the index grows with the corpus — a
        # fold-rewrite would pay O(index) I/O per batch; the delta
        # append pays O(batch). compact_state bounds file count offline.
        append_delta(spark, state_path, assigned, batch_id, _ckpt_query_id(ckpt))

    return (
        emb_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def read_vector_index(
    spark: SparkSession,
    state_path: str,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The maintained index as a batch DataFrame:
    (vec_id, embedding, cell_id)."""
    from rag_lakehouse_spark.streaming.append_state import read_deltas

    state = read_deltas(spark, state_path)
    if state is None:
        raise FileNotFoundError(f"no vector index at {state_path}")
    return state.select(vec_id, vec_col, "cell_id")


def knn_from_vector_index(
    spark: SparkSession,
    state_path: str,
    queries: DataFrame,
    centroids_df: DataFrame,
    k: int = 3,
    n_probe: int = 4,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "q_emb",
) -> DataFrame:
    """Approximate k-NN served from the maintained assignment table:
    probe n_probe cells, exact-rescore candidates — the same
    ``ivf_search`` the batch path runs."""
    assigned = read_vector_index(spark, state_path, vec_id, vec_col)
    return ivf_search(
        assigned, queries, centroids_df, k, n_probe,
        vec_id, vec_col, query_id, query_vec,
    )
