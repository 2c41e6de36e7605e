"""Multi-batch incremental rollup maintenance == batch rollup.

Events replay through an availableNow file stream one file per
trigger; each micro-batch folds into the stored hour-partial table.
The derived hierarchy must equal the batch cascade over all rows —
counts and decimal sums exactly, HLL estimates exactly (sketch union
is associative, so batching cannot change the registers).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_lakehouse_spark.sources.tables import load_table
from rag_lakehouse_spark.streaming.rollup_sink import (
    maintain_hourly_rollup,
    rollup_hierarchy_from_state,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_rollup_stream"))
    # 4 files → 4 micro-batches under maxFilesPerTrigger=1
    load_table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(out)
    return out


def test_incremental_rollup_matches_batch(spark, events_dir, tmp_path_factory):
    state = str(tmp_path_factory.mktemp("rollup_state")) + "/hourly"
    stream = (
        spark.readStream.schema(spark.read.parquet(events_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    q = maintain_hourly_rollup(spark, stream, state)
    q.awaitTermination()
    assert q.lastProgress is not None and q.lastProgress["batchId"] >= 3

    got = {
        (r.grain, r.bucket_start): (r.n_events, r.total_value, r.approx_users)
        for r in rollup_hierarchy_from_state(spark, state).collect()
    }

    raw = spark.read.parquet(events_dir)
    for grain in ("hour", "day", "month"):
        want = {
            r.bucket_start: (r.n, r.v, r.u)
            for r in raw.groupBy(F.date_trunc(grain, "ts").alias("bucket_start"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("v"),
                F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("u"),
            )
            .collect()
        }
        got_grain = {b: v for (g, b), v in got.items() if g == grain}
        assert set(got_grain) == set(want), grain
        for b, (n, v, u) in got_grain.items():
            wn, wv, wu = want[b]
            assert n == wn, (grain, b)
            assert v == pytest.approx(wv, abs=1e-9), (grain, b)
            assert u == wu, (grain, b)  # sketch union is associative


def test_fold_batch_replay_is_idempotent(spark, events_dir, tmp_path_factory):
    """foreachBatch is at-least-once: a batch re-delivered after a
    failure between the state overwrite and the checkpoint commit must
    NOT double-count. fold_batch skips ids <= the stored watermark."""
    from rag_lakehouse_spark.streaming.rollup_sink import fold_batch, read_state

    state = str(tmp_path_factory.mktemp("rollup_replay")) + "/hourly"
    raw = spark.read.parquet(events_dir)
    b0, b1 = raw.limit(500), raw.subtract(raw.limit(500))

    assert fold_batch(spark, state, b0, 0) is True
    snap = sorted(
        (r.bucket_start, r.n_events, str(r.total_value))
        for r in read_state(spark, state).collect()
    )
    # replay of the same batch id: skipped, state byte-identical
    assert fold_batch(spark, state, b0, 0) is False
    assert snap == sorted(
        (r.bucket_start, r.n_events, str(r.total_value))
        for r in read_state(spark, state).collect()
    )
    # next id folds; totals equal the one-shot aggregate over all rows
    assert fold_batch(spark, state, b1, 1) is True
    got_n = read_state(spark, state).agg(F.sum("n_events")).first()[0]
    assert got_n == raw.count()


def test_fold_batch_rejects_reset_checkpoint(spark, events_dir, tmp_path_factory):
    """A reset checkpoint restarts batch ids at 0 against surviving
    state; the stored watermark would then silently skip every batch.
    The ckpt identity stored in the state must fail the fold loudly."""
    import pytest as _pytest

    from rag_lakehouse_spark.streaming.rollup_sink import fold_batch

    state = str(tmp_path_factory.mktemp("rollup_reset")) + "/hourly"
    raw = spark.read.parquet(events_dir)
    b0 = raw.limit(300)

    assert fold_batch(spark, state, b0, 0, ckpt_id="query-A") is True
    assert fold_batch(spark, state, b0, 1, ckpt_id="query-A") is True
    # same checkpoint replays → watermark dedup still works
    assert fold_batch(spark, state, b0, 1, ckpt_id="query-A") is False
    # reset checkpoint (new query id, ids restart at 0) → loud failure,
    # NOT a silent watermark skip
    with _pytest.raises(ValueError, match="identity mismatch"):
        fold_batch(spark, state, b0, 0, ckpt_id="query-B")


def test_identity_survives_identity_less_fold(
    spark, events_dir, tmp_path_factory
):
    """ADVICE r15 #3: a maintenance fold invoked with ckpt_id=None must
    CARRY the stored checkpoint identity forward, not erase it — a
    null written into the pointer would disarm the reset-checkpoint
    guard for every later fold that does pass an identity."""
    import pytest as _pytest

    from rag_lakehouse_spark.streaming.rollup_sink import fold_batch

    state = str(tmp_path_factory.mktemp("rollup_keepid")) + "/hourly"
    raw = spark.read.parquet(events_dir)
    b0 = raw.limit(300)

    assert fold_batch(spark, state, b0, 0, ckpt_id="query-A") is True
    # identity-less fold (manual/maintenance path)
    assert fold_batch(spark, state, b0, 1, ckpt_id=None) is True
    # the guard must still hold query-A's identity afterwards
    with _pytest.raises(ValueError, match="identity mismatch"):
        fold_batch(spark, state, b0, 0, ckpt_id="query-B")
    # ... and the original checkpoint still folds normally
    assert fold_batch(spark, state, b0, 2, ckpt_id="query-A") is True


def test_crash_mid_write_preserves_state(spark, events_dir, tmp_path_factory):
    """An interrupted state write must never corrupt readable state:
    the new version dir lands beside the old one and only the atomic
    CURRENT pointer flip publishes it. Simulate the crash outcome — a
    half-written version dir with no pointer flip — and verify reads
    still serve the old version and the retried fold succeeds."""
    import os

    from rag_lakehouse_spark.streaming.rollup_sink import fold_batch, read_state

    state = str(tmp_path_factory.mktemp("rollup_crash")) + "/hourly"
    raw = spark.read.parquet(events_dir)
    b0, b1 = raw.limit(400), raw.subtract(raw.limit(400))

    assert fold_batch(spark, state, b0, 0) is True
    before = sorted(
        (r.bucket_start, r.n_events) for r in read_state(spark, state).collect()
    )

    # crash mid-write of batch 1: partial v1 dir exists, pointer not flipped
    os.makedirs(os.path.join(state, "v1"), exist_ok=True)
    with open(os.path.join(state, "v1", "part-00000.parquet"), "wb") as f:
        f.write(b"torn half-written parquet")
    assert (
        sorted((r.bucket_start, r.n_events) for r in read_state(spark, state).collect())
        == before
    ), "reads must keep serving the last committed version"

    # the replayed batch overwrites the torn dir and commits
    assert fold_batch(spark, state, b1, 1) is True
    got_n = read_state(spark, state).agg(F.sum("n_events")).first()[0]
    assert got_n == raw.count()


def test_crash_before_first_pointer_flip_reads_empty(spark, events_dir, tmp_path_factory):
    """The FIRST-batch crash window: v0 written (possibly torn) but the
    CURRENT pointer never flipped. There is no committed state, so reads
    must report 'no state yet' — not flat-read the uncommitted v0 as if
    it were folded history — and the replayed batch 0 must fold."""
    import os

    from rag_lakehouse_spark.streaming.rollup_sink import fold_batch, read_state

    state = str(tmp_path_factory.mktemp("rollup_firstcrash")) + "/hourly"
    os.makedirs(os.path.join(state, "v0"))
    with open(os.path.join(state, "v0", "part-00000.parquet"), "wb") as f:
        f.write(b"torn half-written parquet")
    with open(os.path.join(state, "_CURRENT.0.tmp"), "w", encoding="utf-8") as f:
        f.write("v0")  # crash also possible between tmp write and rename

    assert read_state(spark, state) is None

    raw = spark.read.parquet(events_dir)
    assert fold_batch(spark, state, raw.limit(200), 0) is True
    assert read_state(spark, state).agg(F.sum("n_events")).first()[0] == 200


def test_fold_after_empty_batch_state(spark, events_dir, tmp_path_factory):
    """An all-empty first micro-batch folds to a ZERO-ROW state table.
    The checkpoint-identity guard must treat that as 'no identity yet'
    (first() is None), not TypeError on every subsequent fold."""
    from rag_lakehouse_spark.streaming.rollup_sink import fold_batch, read_state

    state = str(tmp_path_factory.mktemp("rollup_emptybatch")) + "/hourly"
    raw = spark.read.parquet(events_dir)

    assert fold_batch(spark, state, raw.limit(0), 0, ckpt_id="query-A") is True
    assert read_state(spark, state).count() == 0
    # the fold that used to wedge with TypeError:
    assert fold_batch(spark, state, raw.limit(250), 1, ckpt_id="query-A") is True
    assert read_state(spark, state).agg(F.sum("n_events")).first()[0] == 250


def test_read_state_raises_on_non_missing_errors(spark, tmp_path_factory):
    """Only path-not-found means 'no state yet'; a corrupt state table
    must fail loud, not silently reset history to empty."""
    import os

    import pytest as _pytest

    from rag_lakehouse_spark.streaming.rollup_sink import _read_state

    missing = str(tmp_path_factory.mktemp("rollup_missing")) + "/nope"
    assert _read_state(spark, missing) is None

    corrupt = str(tmp_path_factory.mktemp("rollup_corrupt")) + "/state"
    os.makedirs(corrupt)
    with open(os.path.join(corrupt, "part-00000.parquet"), "wb") as f:
        f.write(b"this is not a parquet file")
    with _pytest.raises(Exception):
        _read_state(spark, corrupt).collect()


def test_gc_keeps_previous_version_for_lazy_readers(spark, events_dir, tmp_path_factory):
    """GC is deferred by one version: after fold N, version N-1's dir
    survives so a lazy DataFrame handed out by read_state before fold N
    still executes. Only versions older than N-1 are removed."""
    import os
    import re

    from rag_lakehouse_spark.streaming.rollup_sink import fold_batch, read_state

    state = str(tmp_path_factory.mktemp("rollup_gc")) + "/hourly"
    raw = spark.read.parquet(events_dir)
    b = raw.limit(100)

    assert fold_batch(spark, state, b, 0) is True
    assert fold_batch(spark, state, b.limit(50), 1) is True
    lazy = read_state(spark, state)  # resolves to v1
    assert fold_batch(spark, state, b.limit(25), 2) is True

    versions = sorted(e for e in os.listdir(state) if re.fullmatch(r"v\d+", e))
    assert versions == ["v1", "v2"], "keep N and N-1 only"
    # the pre-fold reader still executes against the kept v1 files
    assert lazy.agg(F.sum("n_events")).first()[0] == 150


# --- r12 (VERDICT r11 #5): offline compaction for the fold layout ---

def _fold_families(spark, sf_dir):
    """(name, partial_fn, merge_fn, input_df) for every fold-rewrite
    state family — the compaction contract is per-family tested so a
    family whose merge misbehaves across the boundary can't hide."""
    from rag_lakehouse_spark.plans import crawl_queries as CQ
    from rag_lakehouse_spark.streaming import crawl_sink as CS
    from rag_lakehouse_spark.streaming import graph_sink as GS
    from rag_lakehouse_spark.streaming import media_sink as MS
    from rag_lakehouse_spark.streaming import rollup_sink as RS
    from rag_lakehouse_spark.streaming.dedup_sink import (
        _batch_fingerprints,
        _merge_fingerprints,
    )
    from rag_lakehouse_spark.plans.media_queries import _warc_blobs

    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    return [
        ("hourly", RS._batch_partials, RS._merge,
         ev.select("ts", "value", "user_id")),
        ("daily_type", RS._daily_type_partials, RS._daily_type_merge,
         ev.select("event_type", "ts")),
        ("activity", RS._activity_partials, RS._activity_merge,
         ev.select("user_id", "ts")),
        ("hll", RS._hll_partials, RS._hll_merge,
         ev.select("event_type", "user_id")),
        ("cms", RS._cms_partials, RS._cms_merge, docs.select("text")),
        ("bloom", RS._bloom_partials, RS._bloom_merge,
         ev.select(F.col("user_id").cast("string").alias("k"))
           .filter(F.col("k").isNotNull())),
        ("wsample", RS._wsample_partials, RS._wsample_merge,
         docs.select("doc_id", "n_chars")),
        ("dedup", _batch_fingerprints, _merge_fingerprints,
         docs.select("doc_id", "text")),
        ("encoding", RS._encoding_partials, RS._encoding_merge,
         docs.select("doc_id", "text", "source")),
        ("warc_host", MS._warc_host_partials, MS._warc_host_merge,
         _warc_blobs(spark, sf_dir)),
        # r13: the NSW graph fold (streaming.graph_sink) — the first
        # graph-shaped state under the compaction contract. Batch
        # SEQUENCE determinism is what the boundary test needs; the
        # id-order arrival contract is exercised by the incremental
        # query + test_streaming_graph.py.
        ("nsw", GS._nsw_vec_partials, GS._nsw_merge,
         load_table(spark, sf_dir, "embeddings")
         .select("vec_id", "embedding")),
        # r13: the crawl-report fold (streaming.crawl_sink) — gate
        # counters + per-(fp, host) min-id partials; fully
        # order-independent, so the hash-split batches are fine.
        ("crawl", lambda b: CS._crawl_partials(spark, b),
         CS._crawl_merge, CQ._crawl_fetch_set(spark, sf_dir)),
    ]


def _canon_rows(spark, state_path):
    """State rows normalized for comparison: bookkeeping columns
    dropped, HLL sketch binaries reduced to their estimates (union is
    associative on ESTIMATES; the serialized bytes may differ by merge
    order), everything stringified and sorted."""
    from rag_lakehouse_spark.streaming.rollup_sink import read_state

    df = read_state(spark, state_path)
    assert df is not None
    cols = []
    for fld in df.schema.fields:
        if fld.name in ("last_batch_id", "ckpt_id"):
            continue
        if fld.dataType.typeName() == "binary":
            cols.append(
                F.hll_sketch_estimate(F.col(fld.name)).alias(fld.name)
            )
        else:
            cols.append(F.col(fld.name).cast("string").alias(fld.name))
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_compaction_boundary_per_family(spark, sf_dir, tmp_path_factory):
    """For EVERY fold-layout family: fold two batches, compact (state
    collapses to a single canonical v0), fold a third — the maintained
    state must equal an uninterrupted fold of all three batches, the
    compaction itself must not change a row, and the idempotency
    watermark must survive the boundary (a replayed pre-compaction
    batch is still skipped)."""
    import os

    from rag_lakehouse_spark.streaming.rollup_sink import (
        compact_fold_state,
        fold_batch,
    )

    root = str(tmp_path_factory.mktemp("compact_families"))
    for name, pfn, mfn, full in _fold_families(spark, sf_dir):
        key = full.columns[0]
        b0 = full.filter(F.abs(F.hash(F.col(key).cast("string"))) % 3 == 0)
        b1 = full.filter(F.abs(F.hash(F.col(key).cast("string"))) % 3 == 1)
        b2 = full.filter(F.abs(F.hash(F.col(key).cast("string"))) % 3 == 2)
        a = os.path.join(root, name + "_a")  # compacted mid-history
        b = os.path.join(root, name + "_b")  # uninterrupted control

        assert fold_batch(spark, a, b0, 0, partial_fn=pfn, merge_fn=mfn)
        assert fold_batch(spark, a, b1, 1, partial_fn=pfn, merge_fn=mfn)
        snap = _canon_rows(spark, a)
        assert compact_fold_state(spark, a) is True, name
        # compaction changed no row, and the dir is a single v0
        assert _canon_rows(spark, a) == snap, name
        versions = [e for e in os.listdir(a) if e.startswith("v")]
        assert versions == ["v0"], (name, versions)
        # second compaction is a no-op
        assert compact_fold_state(spark, a) is False, name
        # the watermark survived: a replayed pre-compaction batch skips
        assert (
            fold_batch(spark, a, b1, 1, partial_fn=pfn, merge_fn=mfn)
            is False
        ), name
        # a post-compaction fold lands normally
        assert fold_batch(spark, a, b2, 2, partial_fn=pfn, merge_fn=mfn)

        for i, bb in enumerate((b0, b1, b2)):
            fold_batch(spark, b, bb, i, partial_fn=pfn, merge_fn=mfn)
        assert _canon_rows(spark, a) == _canon_rows(spark, b), name


def test_compact_fold_state_no_state_is_noop(spark, tmp_path_factory):
    from rag_lakehouse_spark.streaming.rollup_sink import compact_fold_state

    empty = str(tmp_path_factory.mktemp("compact_empty")) + "/none"
    assert compact_fold_state(spark, empty) is False


# r16 (VERDICT r15 #2): long referee family - excluded from the
# default fast run; seal runs use -m "slow or not slow".
pytestmark = pytest.mark.slow
