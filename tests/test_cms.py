"""Portable count-min sketch (operators.cms): Spark-built counters
must match a plain Python big-int model, point estimates can never
under-count, and the streaming fold must equal the one-shot batch
sketch while skipping replayed batch ids.
"""

from __future__ import annotations

import hashlib
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rag_lakehouse_spark.operators.cms import (
    CMS_AB,
    CMS_D,
    CMS_W,
    cms_build,
    cms_estimate,
)

_P60 = 1 << 60


def _model_positions(tok: str) -> list[int]:
    h = int(hashlib.md5(f"cms:{tok}".encode()).hexdigest()[:15], 16)
    return [((a * h + b) % _P60) >> 51 for a, b in CMS_AB]


def _model_sketch(toks: list[str]) -> dict[tuple[int, int], int]:
    sk: Counter = Counter()
    for t in toks:
        for j, idx in enumerate(_model_positions(t)):
            sk[(j, idx)] += 1
    return dict(sk)


_toks = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=4), min_size=1, max_size=60
)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(toks=_toks)
def test_cms_counters_and_estimates_match_python_model(spark, toks):
    tdf = spark.createDataFrame([(t,) for t in toks], "t string")
    sketch = cms_build(tdf, "t")
    got = {(r.j, r.idx): r.c for r in sketch.collect()}
    assert got == _model_sketch(toks)
    assert all(0 <= j < CMS_D and 0 <= i < CMS_W for j, i in got)

    exact = Counter(toks)
    items = spark.createDataFrame(
        [(t, c) for t, c in exact.items()], "item string, exact_cnt long"
    )
    est = {
        r.item: r.cms_est
        for r in cms_estimate(sketch, items, "item").collect()
    }
    for t, c in exact.items():
        assert est[t] >= c  # never an under-estimate, structurally
        assert est[t] == min(
            _model_sketch(toks)[(j, idx)]
            for j, idx in enumerate(_model_positions(t))
        )


def test_cms_fold_equals_batch_and_skips_replay(spark, sf_dir, tmp_path_factory):
    """Disjoint micro-batches folded through the versioned state must
    sum to the one-shot sketch; a replayed batch id is a no-op."""
    from rag_lakehouse_spark.functions import text as TX
    from rag_lakehouse_spark.sources.tables import load_table
    from rag_lakehouse_spark.streaming.rollup_sink import (
        _cms_merge,
        _cms_partials,
        fold_batch,
        read_cms_counters,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    state = str(tmp_path_factory.mktemp("cms_state")) + "/counters"
    b0 = d.filter(F.col("doc_id") % 2 == 0)
    b1 = d.filter(F.col("doc_id") % 2 == 1)
    for bid, b in ((0, b0), (1, b1)):
        assert fold_batch(
            spark, state, b, bid, "ckpt-test",
            partial_fn=_cms_partials, merge_fn=_cms_merge,
        )
    assert not fold_batch(  # replay of batch 1 must not double-count
        spark, state, b1, 1, "ckpt-test",
        partial_fn=_cms_partials, merge_fn=_cms_merge,
    )
    got = {(r.j, r.idx): r.c for r in read_cms_counters(spark, state).collect()}
    toks = d.select(
        F.explode(TX.tokens(F.coalesce(F.col("text"), F.lit("")))).alias("t")
    ).filter(F.col("t") != "")
    want = {(r.j, r.idx): r.c for r in cms_build(toks, "t").collect()}
    assert got == want


def test_cms_estimate_is_zero_for_unseen_items(spark):
    """Review catch: an item absent from the build corpus must estimate
    as min over its counters INCLUDING the never-incremented ones
    (count 0) — the left-join path; the old inner join dropped the row
    or overestimated from colliding counters alone."""
    tdf = spark.createDataFrame([("aa",), ("bb",)], "t string")
    sketch = cms_build(tdf, "t")
    items = spark.createDataFrame(
        [("zz-not-in-corpus", 0)], "item string, exact_cnt long"
    )
    rows = cms_estimate(sketch, items, "item").collect()
    assert len(rows) == 1
    assert rows[0].cms_est == 0  # at least one of its 4 counters is empty


def test_partial_sketch_state_is_caught_by_negative_overcount(
    spark, sf_dir, tmp_path_factory
):
    """ADVICE r15 #1: corpus_cms_incremental derives the heavy-hitter
    threshold n from the MAINTAINED sketch (row j=0 sum) while the
    candidates are recounted from the full corpus — sound only because
    the availableNow replay folds every batch before the read. This
    pins the invariant's DETECTABILITY: a partial/stale sketch cannot
    silently masquerade as a synced one, because some reported
    ``overcount`` (cms_est - exact_cnt) turns NEGATIVE — a structural
    impossibility for a synced sketch, whose counters only ever sum
    tokens IN (cms_est >= exact_cnt for every item)."""
    from rag_lakehouse_spark.functions import text as TX
    from rag_lakehouse_spark.operators.heavy_hitters import heavy_hitters_exact
    from rag_lakehouse_spark.sources.tables import load_table
    from rag_lakehouse_spark.streaming.rollup_sink import (
        _cms_merge,
        _cms_partials,
        fold_batch,
        read_cms_counters,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select(
        F.explode(TX.tokens(F.coalesce(F.col("text"), F.lit("")))).alias("t")
    ).filter(F.col("t") != "")

    def report(sketch):
        total = sketch.filter(F.col("j") == 0).agg(
            F.sum("c").cast("bigint").alias("n")
        )
        heavy = heavy_hitters_exact(
            toks, "t", k=400, ratio_den=200, total=total
        ).withColumnRenamed("cnt", "exact_cnt")
        return {
            r["item"]: r["cms_est"] - r["exact_cnt"]
            for r in cms_estimate(sketch, heavy, "item").collect()
        }

    # full replay: overcount >= 0 for EVERY item (the synced invariant)
    full_state = str(tmp_path_factory.mktemp("cms_full")) + "/counters"
    b0 = d.filter(F.col("doc_id") % 2 == 0)
    b1 = d.filter(F.col("doc_id") % 2 == 1)
    for bid, b in ((0, b0), (1, b1)):
        fold_batch(spark, full_state, b, bid, "ckpt-full",
                   partial_fn=_cms_partials, merge_fn=_cms_merge)
    full = report(read_cms_counters(spark, full_state))
    assert full and all(v >= 0 for v in full.values())

    # partial replay (half the corpus folded): the desync surfaces as
    # at least one negative overcount in the OUTPUT — divergence is
    # caught, not silent
    part_state = str(tmp_path_factory.mktemp("cms_part")) + "/counters"
    fold_batch(spark, part_state, b0, 0, "ckpt-part",
               partial_fn=_cms_partials, merge_fn=_cms_merge)
    part = report(read_cms_counters(spark, part_state))
    assert part and any(v < 0 for v in part.values())


import pytest

# r16 (VERDICT r15 #2): long referee family - excluded from the
# default fast run; seal runs use -m "slow or not slow".
pytestmark = pytest.mark.slow
