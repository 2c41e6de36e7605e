"""Similarity-search invariants (FIXTURES.md §6): a vector's nearest
neighbor is itself (score 1); exact/LSH/IVF variants agree on planted
identical vectors; recall of approximate variants is sane on the real
embeddings table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_lakehouse_spark.operators.similarity import (
    kmeans_centroids,
    knn_exact,
    knn_ivf,
    knn_lsh,
)
from rag_lakehouse_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )


def test_knn_self_is_top1(emb, queries):
    top = knn_exact(emb, queries, k=1).collect()
    for r in top:
        assert r.neighbor_id == r.query_id
        assert r.score == pytest.approx(1.0, abs=1e-9)


def test_knn_exact_rank_ordering(emb, queries):
    rows = knn_exact(emb, queries, k=5).filter(F.col("query_id") == 0).collect()
    scores = [r.score for r in sorted(rows, key=lambda r: r.rank)]
    assert scores == sorted(scores, reverse=True)
    assert len(rows) == 5


def test_knn_lsh_finds_self(emb, queries):
    top = knn_lsh(emb, queries, k=1, dim=64, n_planes=6).collect()
    # self always lands in the same bucket as itself
    assert all(r.neighbor_id == r.query_id for r in top)


def test_knn_ivf_finds_self(emb, queries):
    top = knn_ivf(emb, queries, k=1, n_cells=8, n_probe=8).collect()
    # probing all cells → must find the identical vector
    assert all(r.neighbor_id == r.query_id for r in top)


def test_lsh_recall_vs_exact(emb, queries):
    exact = {
        (r.query_id, r.neighbor_id)
        for r in knn_exact(emb, queries, k=10).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in knn_lsh(emb, queries, k=10, dim=64, n_planes=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2  # 4 planes / 16 buckets on 500 random vectors


def test_kmeans_centroids_deterministic_unit_and_complete(emb):
    import numpy as np

    corpus = emb.filter(F.col("vec_id") >= 5)
    a = kmeans_centroids(corpus, n_cells=8, n_iters=2).collect()
    b = kmeans_centroids(corpus, n_cells=8, n_iters=2).collect()
    assert {r.cell_id: r.centroid for r in a} == {r.cell_id: r.centroid for r in b}
    assert sorted(r.cell_id for r in a) == list(range(8))  # no lost cells
    for r in a:
        assert np.linalg.norm(r.centroid) == pytest.approx(1.0, abs=1e-4)


def test_ivf_with_trained_centroids_finds_self(emb, queries):
    cents = kmeans_centroids(emb, n_cells=8, n_iters=2)
    top = knn_ivf(emb, queries, k=1, n_cells=8, n_probe=8, centroids_df=cents).collect()
    # probing all cells → must find the identical vector regardless of
    # which learned cell it was assigned to
    assert all(r.neighbor_id == r.query_id for r in top)
    assert all(r.score == pytest.approx(1.0, abs=1e-9) for r in top)
