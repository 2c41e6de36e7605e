"""Streaming-maintained IVF index == batch IVF.

Assignments are per-row pure functions of (vector, frozen centroids),
so folding them across micro-batches cannot change the maintained
table; the serving read runs the identical ivf_search expressions —
the incremental result must equal the one-shot knn_ivf row-for-row,
score bits included.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from rag_lakehouse_spark.operators.similarity import knn_ivf
from rag_lakehouse_spark.sources.tables import load_table
from rag_lakehouse_spark.streaming.vector_sink import (
    knn_from_vector_index,
    maintain_vector_index,
    read_vector_index,
)

N_CELLS = 16


@pytest.fixture(scope="module")
def corpus_q_centroids(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") >= 20).select("vec_id", "embedding")
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    w_strat = W.partitionBy(F.col("vec_id") % N_CELLS).orderBy("vec_id")
    centroids = (
        corpus.withColumn("__rn", F.row_number().over(w_strat))
        .filter(F.col("__rn") == 1)
        .select(
            (F.col("vec_id") % N_CELLS).alias("cell_id"),
            F.col("embedding").alias("centroid"),
        )
    )
    return corpus, q, centroids


def test_incremental_ivf_equals_batch_ivf(spark, corpus_q_centroids, tmp_path_factory):
    corpus, q, centroids = corpus_q_centroids
    src = str(tmp_path_factory.mktemp("emb_stream"))
    corpus.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path_factory.mktemp("ivf_state")) + "/index"
    qry = maintain_vector_index(spark, stream, state, centroids)
    qry.awaitTermination()
    assert qry.lastProgress is not None and qry.lastProgress["batchId"] >= 3

    # maintained table covers every corpus vector exactly once
    idx = read_vector_index(spark, state)
    assert idx.count() == corpus.count()
    assert idx.select("vec_id").distinct().count() == corpus.count()

    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.score)
        for r in knn_from_vector_index(
            spark, state, q, centroids, k=10, n_probe=4
        ).collect()
    }
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.score)
        for r in knn_ivf(
            corpus, q, k=10, n_cells=N_CELLS, n_probe=4, centroids_df=centroids
        ).collect()
    }
    assert got == want  # identical rows, score bits included


# r16 (VERDICT r15 #2): long referee family - excluded from the
# default fast run; seal runs use -m "slow or not slow".
pytestmark = pytest.mark.slow
