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


def test_guided_insert_referee(spark, sf_dir):
    """The graph-guided insertion rule (r15, VERDICT r14 #1) refereed
    by the exact rule it replaces above ``NSW_GUIDED_MIN_STATE``:
    per id-ordered fold, guided edges vs ``nsw_fwd_edges(batch,
    state ∪ batch)`` — the FIRST fold must be bit-identical (no state
    yet ⇒ the complete in-batch candidate set IS the exact rule), the
    overall adjacency recall must clear 0.995, and the size-adaptive
    dispatch must route below-threshold folds to the exact rule and
    above-threshold folds to the guided one."""
    from rag_lakehouse_spark.operators.graph_ann import (
        nsw_insert_edges_guided,
    )
    from rag_lakehouse_spark.streaming.graph_sink import nsw_batch_edges

    corpus = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") != 0)
        .select("vec_id", "embedding")
        .withColumn("nrm", VEC.l2_norm("embedding"))
    )
    max_id = corpus.agg(F.max("vec_id")).first()[0]
    state_vecs = state_fwd = None
    n_exact = n_hit = 0
    for i in range(4):
        lo = i * (max_id + 1) // 4
        hi = (i + 1) * (max_id + 1) // 4
        batch = corpus.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        )
        if batch.count() == 0:
            continue
        cand = (
            state_vecs.unionByName(batch) if state_vecs is not None else batch
        )
        exact = nsw_fwd_edges(batch, cand, m=8)
        guided = nsw_insert_edges_guided(
            batch, state_vecs, state_fwd, m=8, max_known_id=hi - 1
        )
        e = set((r["src"], r["dst"]) for r in exact.collect())
        g = set((r["src"], r["dst"]) for r in guided.collect())
        if state_vecs is None:
            assert g == e, "first fold must be bit-identical"
        n_exact += len(e)
        n_hit += len(e & g)
        # the maintained state stays the exact graph (what ships at
        # test scale), so every fold's referee is the true adjacency
        state_vecs = cand
        new_fwd = exact
        state_fwd = (
            new_fwd
            if state_fwd is None
            else state_fwd.unionByName(new_fwd)
        ).localCheckpoint(eager=True)
    assert n_exact > 0
    assert n_hit / n_exact >= 0.995, (n_hit, n_exact)

    # dispatch: prev_max below the threshold -> exact rule output;
    # forced above -> the guided rule's output (both deterministic)
    batch = corpus.filter(F.col("vec_id") >= (3 * (max_id + 1)) // 4)
    prev_vecs = corpus.filter(F.col("vec_id") < (3 * (max_id + 1)) // 4)
    low = nsw_batch_edges(
        batch, prev_vecs, state_fwd, m=8, prev_max=1, batch_max=max_id
    )
    want_exact = nsw_fwd_edges(batch, prev_vecs.unionByName(batch), m=8)
    assert sorted(map(tuple, low.collect())) == sorted(
        map(tuple, want_exact.collect())
    )
    high = nsw_batch_edges(
        batch, prev_vecs, state_fwd, m=8,
        prev_max=10**9, batch_max=max_id,
    )
    want_guided = nsw_insert_edges_guided(
        batch, prev_vecs, state_fwd, m=8, max_known_id=max_id
    )
    assert sorted(map(tuple, high.collect())) == sorted(
        map(tuple, want_guided.collect())
    )


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


def test_append_layout_equals_fold_rewrite_layout(
    spark, sf_dir, tmp_path_factory
):
    """The append-only shipped path (r14, VERDICT r13 #3) against the
    fold-rewrite twin: same four id-ordered batches through both
    sinks' fold functions → row-identical vec and edge sets; plus the
    append path's own contracts — O(1) order guard rejects an
    out-of-order batch, a REPLAYED batch leaves the state unchanged
    (the as_of snapshot keeps its own prior attempt out of the
    candidate set), and offline compaction preserves rows."""
    import pytest

    from rag_lakehouse_spark.streaming.append_state import (
        _local,
        _write_marker,
        append_delta,
        compact_state,
        read_deltas,
    )
    from rag_lakehouse_spark.streaming.graph_sink import (
        _read_max_marker,
        read_nsw_index_append,
    )
    from rag_lakehouse_spark.operators.graph_ann import (
        nsw_fwd_edges as _fwd,
    )

    corpus = (
        load_table(spark, sf_dir, "embeddings")
        .filter((F.col("vec_id") != 0) & (F.col("vec_id") <= 80))
        .select("vec_id", "embedding")
    )
    root = str(tmp_path_factory.mktemp("nsw_append"))
    fold_state = os.path.join(root, "fold")
    app_state = os.path.join(root, "append")

    def batches():
        for i in range(4):
            lo, hi = i * 21, (i + 1) * 21
            yield i, corpus.filter(
                (F.col("vec_id") > lo) & (F.col("vec_id") <= hi)
            )

    # fold-rewrite twin
    for i, b in batches():
        fold_batch(
            spark,
            fold_state,
            b,
            i,
            partial_fn=_nsw_vec_partials,
            merge_fn=_nsw_merge,
        )

    # append path: drive the same per-batch logic the streaming entry
    # point runs (availableNow plumbing is covered by the registered
    # incremental query; here we exercise fold semantics directly)
    def append_fold(batch_df, batch_id):
        batch_rows = _nsw_vec_partials(batch_df)
        new_vecs = batch_rows.select("vec_id", "embedding", "nrm")
        bounds = new_vecs.agg(
            F.min("vec_id").alias("lo"), F.max("vec_id").alias("hi")
        ).first()
        mk_bid, mk_prev, mk_new, _, _ = _read_max_marker(_local(app_state))
        prev_max = mk_prev if mk_bid >= int(batch_id) else mk_new
        if prev_max is not None and bounds["lo"] <= prev_max:
            raise ValueError("NSW insertion-order contract violated")
        prev = read_deltas(spark, app_state, as_of=int(batch_id) - 1)
        cand = (
            prev.filter(F.col("kind") == "vec")
            .select("vec_id", "embedding", "nrm")
            .unionByName(new_vecs)
            if prev is not None
            else new_vecs
        )
        fwd = _fwd(new_vecs, cand, m=8)
        edges = fwd.select(
            F.lit("edge").alias("kind"),
            F.lit(None).cast("bigint").alias("vec_id"),
            F.lit(None)
            .cast(batch_rows.schema["embedding"].dataType)
            .alias("embedding"),
            F.lit(None).cast("double").alias("nrm"),
            "src",
            "dst",
        )
        append_delta(spark, app_state, batch_rows.unionByName(edges), batch_id)
        new_max = (
            bounds["hi"] if prev_max is None else max(prev_max, bounds["hi"])
        )
        _write_marker(
            _local(app_state),
            "MAX_VEC_ID",
            f"{int(batch_id)} "
            f"{'-' if prev_max is None else prev_max} {new_max}",
        )

    for i, b in batches():
        append_fold(b, i)

    def snapshot(state_reader):
        vecs, graph = state_reader
        return (
            sorted((r["vec_id"], r["nrm"]) for r in vecs.collect()),
            sorted((r["src"], r["dst"]) for r in graph.collect()),
        )

    fold_snap = snapshot(read_nsw_index(spark, fold_state))
    app_snap = snapshot(read_nsw_index_append(spark, app_state))
    assert fold_snap == app_snap

    # replay of the last batch: identical state after (idempotent)
    last = list(batches())[-1]
    append_fold(last[1], last[0])
    assert snapshot(read_nsw_index_append(spark, app_state)) == app_snap

    # out-of-order batch rejected by the O(1) marker guard
    with pytest.raises(ValueError, match="insertion-order"):
        append_fold(corpus.filter(F.col("vec_id") <= 5), 9)

    # offline compaction preserves every row
    assert compact_state(spark, app_state) > 0
    assert snapshot(read_nsw_index_append(spark, app_state)) == app_snap


def test_guided_threshold_floor_cannot_be_detuned(monkeypatch):
    """VERDICT r15 #5: the env dial `RLS_NSW_GUIDED_MIN_STATE` may only
    RAISE the guided-insert crossover, never lower it below the
    compile-time floor — a value below the test-SF state sizes would
    silently flip a declared query's folds onto the approximate guided
    rule and change its output. Values below the floor are clamped."""
    import importlib

    import rag_lakehouse_spark.streaming.graph_sink as gs

    floor = gs.NSW_GUIDED_MIN_STATE_FLOOR
    assert floor >= 10_000  # > 2x the largest test-SF maintained state

    monkeypatch.setenv("RLS_NSW_GUIDED_MIN_STATE", "1")
    importlib.reload(gs)
    try:
        assert gs.NSW_GUIDED_MIN_STATE == floor
        # raising it above the floor is still honored (the dial's job)
        monkeypatch.setenv("RLS_NSW_GUIDED_MIN_STATE", str(floor * 20))
        importlib.reload(gs)
        assert gs.NSW_GUIDED_MIN_STATE == floor * 20
    finally:
        monkeypatch.delenv("RLS_NSW_GUIDED_MIN_STATE", raising=False)
        importlib.reload(gs)
    assert gs.NSW_GUIDED_MIN_STATE == 50_000  # default restored


def test_dispatch_prefers_actual_count_over_id_proxy(spark, sf_dir):
    """ADVICE r15 #2: with sparse or offset id spaces the max-vec_id
    proxy overstates the state size; when the sinks know the ACTUAL
    maintained vector count, dispatch must follow it — a small state
    stays on the bit-identical exact rule no matter how large its ids
    are, and a genuinely large state goes guided even if its ids are
    small. The proxy remains the fallback for legacy state (None)."""
    from rag_lakehouse_spark.operators.graph_ann import (
        nsw_insert_edges_guided,
    )
    from rag_lakehouse_spark.streaming.graph_sink import (
        NSW_GUIDED_MIN_STATE,
        nsw_batch_edges,
    )

    corpus = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") != 0)
        .select("vec_id", "embedding")
        .withColumn("nrm", VEC.l2_norm("embedding"))
    )
    max_id = corpus.agg(F.max("vec_id")).first()[0]
    cut = (3 * (max_id + 1)) // 4
    batch = corpus.filter(F.col("vec_id") >= cut)
    prev_vecs = corpus.filter(F.col("vec_id") < cut)
    prev_fwd = nsw_fwd_edges(prev_vecs, prev_vecs, m=8).localCheckpoint(
        eager=True
    )
    want_exact = sorted(
        map(tuple, nsw_fwd_edges(batch, prev_vecs.unionByName(batch), m=8).collect())
    )
    # sparse ids: proxy says huge, actual count says tiny -> exact rule
    sparse = nsw_batch_edges(
        batch, prev_vecs, prev_fwd, m=8,
        prev_max=10**9, batch_max=max_id, prev_count=5,
    )
    assert sorted(map(tuple, sparse.collect())) == want_exact
    # dense small ids but a big actual count -> guided rule
    dense = nsw_batch_edges(
        batch, prev_vecs, prev_fwd, m=8,
        prev_max=1, batch_max=max_id, prev_count=NSW_GUIDED_MIN_STATE,
    )
    want_guided = nsw_insert_edges_guided(
        batch, prev_vecs, prev_fwd, m=8, max_known_id=max_id
    )
    assert sorted(map(tuple, dense.collect())) == sorted(
        map(tuple, want_guided.collect())
    )


import pytest

# r16 (VERDICT r15 #2): long referee family - excluded from the
# default fast run; seal runs use -m "slow or not slow".
pytestmark = pytest.mark.slow
