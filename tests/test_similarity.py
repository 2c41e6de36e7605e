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


# --- r12: graph ANN (frozen M-NN graph + beam walk) ---


def test_beam_search_matches_python_referee_fuzz(spark):
    """The Spark iterative-bounded-join walk must equal the pure-Python
    referee on hypothesis-chosen graphs, entry sets, beam widths, and
    round counts — including tie scores (total order (score DESC,
    vec_id ASC)), dangling entries, and duplicate entries."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rag_lakehouse_spark.operators.graph_ann import (
        beam_search,
        beam_search_py,
    )

    @settings(max_examples=6, deadline=None)
    @given(data=st.data())
    def check(data):
        n = data.draw(st.integers(min_value=3, max_value=24), label="n")
        nodes = list(range(1, n + 1))
        # coarse score grid → frequent ties, exercising the tiebreak
        scores = {
            i: data.draw(
                st.integers(min_value=-3, max_value=3), label=f"s{i}"
            )
            / 4.0
            for i in nodes
        }
        adj = {
            i: data.draw(
                st.lists(
                    st.sampled_from([j for j in nodes if j != i]),
                    max_size=4,
                    unique=True,
                ),
                label=f"adj{i}",
            )
            for i in nodes
        }
        entries = data.draw(
            st.lists(st.sampled_from(nodes), min_size=1, max_size=4),
            label="entries",
        )
        beam_width = data.draw(st.integers(min_value=1, max_value=8), label="B")
        rounds = data.draw(st.integers(min_value=1, max_value=4), label="T")

        want = beam_search_py(adj, scores, entries, beam_width, rounds)

        edges = [(s, d) for s, ds in adj.items() for d in ds]
        graph_df = spark.createDataFrame(
            edges or [(0, 0)], "src bigint, dst bigint"
        )
        if not edges:
            graph_df = graph_df.filter(F.lit(False))
        scores_df = spark.createDataFrame(
            [(k, float(v)) for k, v in scores.items()],
            "vec_id bigint, score double",
        )
        entries_df = spark.createDataFrame(
            [(e,) for e in entries], "vec_id bigint"
        )
        rows = beam_search(
            graph_df, scores_df, entries_df, beam_width, rounds
        ).collect()
        got = sorted((r.rank, r.vec_id, r.score) for r in rows)
        assert got == [(rk, nid, float(s)) for rk, nid, s in want]

    check()


def test_beam_search_is_monotone_and_bounded():
    """Referee-level properties at fuzz scale (no Spark): the best
    beam score never worsens round over round, the beam never exceeds
    its width, and more rounds never return a worse top-1."""
    import random

    from rag_lakehouse_spark.operators.graph_ann import beam_search_py

    rng = random.Random(42)
    for _ in range(50):
        n = rng.randint(4, 40)
        nodes = list(range(1, n + 1))
        scores = {i: rng.uniform(-1, 1) for i in nodes}
        adj = {
            i: rng.sample(
                [j for j in nodes if j != i], k=rng.randint(0, min(6, n - 1))
            )
            for i in nodes
        }
        entries = rng.sample(nodes, k=rng.randint(1, 3))
        width = rng.randint(1, 10)
        prev_best = None
        for t in range(1, 5):
            beam = beam_search_py(adj, scores, entries, width, t)
            assert len(beam) <= width
            assert [r for r, _, _ in beam] == list(range(1, len(beam) + 1))
            best = beam[0][2]
            if prev_best is not None:
                assert best >= prev_best - 1e-12
            prev_best = best


def test_knn_graph_degree_and_symmetry_free(spark, emb):
    """The frozen adjacency: exactly min(m, n-1) out-edges per node,
    no self-loops, and the neighbor of a PLANTED duplicate vector is
    that duplicate (sim 1 sorts first)."""
    from rag_lakehouse_spark.operators.graph_ann import knn_graph
    from rag_lakehouse_spark.plans.vector_queries import _normed

    base = _normed(emb.filter(F.col("vec_id") < 40))
    g = knn_graph(base, m=5)
    deg = g.groupBy("src").count().collect()
    assert all(r["count"] == 5 for r in deg)
    assert len(deg) == 40
    assert g.filter(F.col("src") == F.col("dst")).count() == 0
    # plant an exact duplicate of vec 3 as id 1000: its top neighbor
    # must be 3 (cosine 1), and vice versa
    dup = base.filter(F.col("vec_id") == 3).withColumn(
        "vec_id", F.lit(1000).cast("bigint")
    )
    g2 = knn_graph(base.unionByName(dup), m=1)
    top = {r.src: r.dst for r in g2.collect()}
    assert top[1000] == 3 and top[3] == 1000


def test_nn_descent_converges_to_exact_builds(spark, emb):
    """The scalable NN-descent build (VERDICT r13 #1) against the
    O(n²) referees at the fixture SF, both variants:

    - adjacency recall ≥ 0.99 vs the exact build (the guaranteed
      floor; measured 1.0 here — the exact head slab covers half this
      corpus and the band sampling recovers the tail),
    - the SERVE WALK over the descent graph is bit-identical to the
      walk over the exact graph (the property the shared unrolled-CTE
      oracle checks end-to-end),
    - structural contract: out-degree ≤ m, insert-order constraint
      (dst < src) for the triangular variant, no self-loops for the
      flat one.
    """
    from rag_lakehouse_spark.operators.graph_ann import (
        beam_search,
        knn_graph,
        nn_descent_edges,
        nsw_fwd_edges,
    )
    from rag_lakehouse_spark.functions import vector as VEC
    from rag_lakehouse_spark.plans.vector_queries import _normed

    e = _normed(emb)
    corpus = e.filter(F.col("vec_id") != 0)
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv"), F.col("nrm").alias("qn")
    )
    scores = corpus.crossJoin(F.broadcast(q)).select(
        "vec_id",
        (
            VEC.dot("embedding", "qv")
            / (F.col("nrm") * F.col("qn") + F.lit(1e-24))
        ).alias("score"),
    )

    for prior_only in (True, False):
        exact_fn = (
            (lambda: nsw_fwd_edges(corpus, corpus, m=8))
            if prior_only
            else (lambda: knn_graph(corpus, m=8))
        )
        exact = exact_fn().localCheckpoint(eager=True)
        desc = nn_descent_edges(
            corpus, m=8, iters=2, seed_bands=12, prior_only=prior_only
        ).localCheckpoint(eager=True)

        es = {(r["src"], r["dst"]) for r in exact.collect()}
        ds = {(r["src"], r["dst"]) for r in desc.collect()}
        recall = len(es & ds) / len(es)
        assert recall >= 0.99, f"prior_only={prior_only}: recall {recall}"

        # structural contract
        deg = desc.groupBy("src").count().agg(F.max("count")).first()[0]
        assert deg <= 8
        if prior_only:
            assert desc.filter(F.col("dst") >= F.col("src")).count() == 0
        else:
            assert desc.filter(F.col("dst") == F.col("src")).count() == 0

        # serve-walk parity: what the shared oracle actually checks
        def walk(fwd):
            graph = (
                fwd.unionByName(
                    fwd.select(
                        F.col("dst").alias("src"), F.col("src").alias("dst")
                    )
                )
                if prior_only
                else fwd
            )
            entries = corpus.agg(F.min("vec_id").alias("vec_id"))
            w = beam_search(graph, scores, entries, beam_width=24, rounds=6)
            return [
                (r["rank"], r["vec_id"])
                for r in w.filter(F.col("rank") <= 10).collect()
            ]

        assert walk(desc) == walk(exact), f"prior_only={prior_only}"
