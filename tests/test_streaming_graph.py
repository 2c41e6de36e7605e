"""streaming.graph_sink: the maintained NSW index must equal the
frozen triangular build exactly when batches arrive in insertion
(vec_id) order — the adjacency-level identity behind the shared
oracle of ``ann_graph_nsw_incremental`` / ``ann_graph_nsw_portable``.
(The fold→compact→fold boundary for this family is covered by
``test_streaming_rollup.test_compaction_boundary_per_family``.)
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rag_lakehouse_spark.functions import vector as VEC
from rag_lakehouse_spark.operators.graph_ann import nsw_fwd_edges
from rag_lakehouse_spark.sources.tables import load_table
from rag_lakehouse_spark.streaming.graph_sink import (
    _nsw_merge,
    _nsw_vec_partials,
    read_nsw_index,
)
from rag_lakehouse_spark.streaming.rollup_sink import fold_batch


def test_maintained_adjacency_equals_frozen_build(
    spark, sf_dir, tmp_path_factory
):
    """Fold four id-ordered batches, then compare the maintained
    forward-edge set (and the vector set) to the one-shot triangular
    build over the same corpus — the maintained index must be
    IDENTICAL, not merely equivalent."""
    corpus = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") != 0)
        .select("vec_id", "embedding")
    )
    max_id = corpus.agg(F.max("vec_id")).first()[0]
    state = os.path.join(str(tmp_path_factory.mktemp("nsw_state")), "nsw")
    for i in range(4):
        lo = i * (max_id + 1) // 4
        hi = (i + 1) * (max_id + 1) // 4
        batch = corpus.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        )
        fold_batch(
            spark,
            state,
            batch,
            i,
            partial_fn=_nsw_vec_partials,
            merge_fn=_nsw_merge,
        )
    vecs, graph = read_nsw_index(spark, state)

    frozen_corpus = corpus.withColumn("nrm", VEC.l2_norm("embedding"))
    frozen_fwd = nsw_fwd_edges(frozen_corpus, frozen_corpus)
    expected_fwd = frozen_fwd.unionByName(
        frozen_fwd.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    )
    got = sorted((r["src"], r["dst"]) for r in graph.collect())
    want = sorted((r["src"], r["dst"]) for r in expected_fwd.collect())
    assert got == want
    assert vecs.count() == corpus.count()
    # norms stored at ingest match the serving expression exactly
    mism = (
        vecs.join(frozen_corpus.select("vec_id", F.col("nrm").alias("n2")),
                  "vec_id")
        .filter(F.col("nrm") != F.col("n2"))
        .count()
    )
    assert mism == 0


def test_out_of_order_batch_changes_graph_is_real_nsw_semantics(
    spark, sf_dir, tmp_path_factory
):
    """Arrival order IS insertion order for NSW: folding the same two
    batches in the opposite order must produce a different forward
    edge set — the HIGH-id batch folded first picks its top-M from a
    candidate set missing the not-yet-arrived low ids (under the
    dst < src rule the late low ids themselves still only see lower
    ids) — the reason the incremental query pins file arrival order,
    and the documented contract of ``maintain_nsw_index``."""
    corpus = (
        load_table(spark, sf_dir, "embeddings")
        .filter((F.col("vec_id") != 0) & (F.col("vec_id") <= 40))
        .select("vec_id", "embedding")
    )
    lowb = corpus.filter(F.col("vec_id") <= 20)
    highb = corpus.filter(F.col("vec_id") > 20)
    root = str(tmp_path_factory.mktemp("nsw_order"))
    edges = {}
    for name, seq in (("fwd", (lowb, highb)), ("rev", (highb, lowb))):
        st = os.path.join(root, name)
        for i, b in enumerate(seq):
            fold_batch(
                spark,
                st,
                b,
                i,
                partial_fn=_nsw_vec_partials,
                merge_fn=_nsw_merge,
            )
        _, graph = read_nsw_index(spark, st)
        edges[name] = sorted(
            (r["src"], r["dst"]) for r in graph.collect()
        )
    assert edges["fwd"] != edges["rev"]


def test_maintain_path_rejects_out_of_order_batch(spark, sf_dir):
    """The streaming entry point's enforce_order guard (r13 review):
    a batch whose min vec_id is not above the maintained max must fail
    FAST with ValueError — silent folding would build an adjacency
    that permanently differs from the frozen build, detectable only as
    a later oracle mismatch."""
    import pytest

    corpus = (
        load_table(spark, sf_dir, "embeddings")
        .filter((F.col("vec_id") != 0) & (F.col("vec_id") <= 40))
        .select("vec_id", "embedding")
    )
    high = _nsw_vec_partials(corpus.filter(F.col("vec_id") > 20))
    low = corpus.filter(F.col("vec_id") <= 20)
    state_after_high = _nsw_merge(high.limit(0), high)
    with pytest.raises(ValueError, match="insertion-order"):
        _nsw_merge(
            state_after_high,
            _nsw_vec_partials(low),
            enforce_order=True,
        ).collect()
    # in-order folding under the guard is untouched
    ordered = _nsw_merge(
        _nsw_merge(
            _nsw_vec_partials(low).limit(0), _nsw_vec_partials(low)
        ),
        _nsw_vec_partials(corpus.filter(F.col("vec_id") > 20)),
        enforce_order=True,
    )
    assert ordered.filter(F.col("kind") == "vec").count() == corpus.count()
