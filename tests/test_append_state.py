"""Append-only delta state (streaming.append_state): O(batch) folds
for union-merge indexes. Locks the layout's correctness claims:
replay idempotency, torn-delta invisibility, offline compaction
equivalence (including crash placement), and the checkpoint-identity
guard."""

from __future__ import annotations

import os
import shutil

import pytest

from rag_lakehouse_spark.streaming.append_state import (
    append_delta,
    compact_state,
    read_deltas,
)


def _rows(spark, state):
    df = read_deltas(spark, state)
    return sorted((r.k, r.v) for r in df.collect()) if df is not None else None


def _mk(spark, pairs):
    return spark.createDataFrame(pairs, "k long, v string")


def test_append_read_roundtrip_and_empty(spark, tmp_path_factory):
    state = str(tmp_path_factory.mktemp("append")) + "/idx"
    assert read_deltas(spark, state) is None
    assert append_delta(spark, state, _mk(spark, [(1, "a")]), 0)
    assert append_delta(spark, state, _mk(spark, [(2, "b"), (3, "c")]), 1)
    assert _rows(spark, state) == [(1, "a"), (2, "b"), (3, "c")]


def test_replay_overwrites_own_delta_only(spark, tmp_path_factory):
    state = str(tmp_path_factory.mktemp("replay")) + "/idx"
    append_delta(spark, state, _mk(spark, [(1, "a")]), 0)
    append_delta(spark, state, _mk(spark, [(2, "b")]), 1)
    # at-least-once replay of batch 1 re-delivers the same rows
    append_delta(spark, state, _mk(spark, [(2, "b")]), 1)
    assert _rows(spark, state) == [(1, "a"), (2, "b")]


def test_torn_delta_is_invisible(spark, tmp_path_factory):
    state = str(tmp_path_factory.mktemp("torn")) + "/idx"
    append_delta(spark, state, _mk(spark, [(1, "a")]), 0)
    # simulate a crash mid-append: delta dir without _SUCCESS
    torn = os.path.join(state, "d1")
    _mk(spark, [(9, "x")]).write.mode("overwrite").parquet(torn)
    os.remove(os.path.join(torn, "_SUCCESS"))
    assert _rows(spark, state) == [(1, "a")]
    # the replay then overwrites the torn dir and commits
    append_delta(spark, state, _mk(spark, [(9, "x")]), 1)
    assert _rows(spark, state) == [(1, "a"), (9, "x")]


def test_compaction_preserves_rows_and_skips_replays(spark, tmp_path_factory):
    state = str(tmp_path_factory.mktemp("compact")) + "/idx"
    for i in range(3):
        append_delta(spark, state, _mk(spark, [(i, f"v{i}")]), i)
    before = _rows(spark, state)
    assert compact_state(spark, state) == 3
    assert _rows(spark, state) == before
    # a replay of a compacted batch is skipped, not double-appended
    assert append_delta(spark, state, _mk(spark, [(2, "v2")]), 2) is False
    assert _rows(spark, state) == before
    # post-compaction appends still land; second compaction folds them
    assert append_delta(spark, state, _mk(spark, [(7, "v7")]), 7)
    assert compact_state(spark, state) == 1
    assert _rows(spark, state) == before + [(7, "v7")]


def test_ckpt_identity_guard(spark, tmp_path_factory):
    state = str(tmp_path_factory.mktemp("ident")) + "/idx"
    append_delta(spark, state, _mk(spark, [(1, "a")]), 0, ckpt_id="q-A")
    with pytest.raises(ValueError, match="identity mismatch"):
        append_delta(spark, state, _mk(spark, [(2, "b")]), 0, ckpt_id="q-B")


def test_crash_before_compaction_marker_leaves_old_state(spark, tmp_path_factory):
    """The compact dir is written ASIDE; until the single atomic marker
    flip, readers use the old marker + old dirs — simulate the crash by
    writing the new compact dir without the marker."""
    state = str(tmp_path_factory.mktemp("crash")) + "/idx"
    for i in range(2):
        append_delta(spark, state, _mk(spark, [(i, f"v{i}")]), i)
    before = _rows(spark, state)
    merged = read_deltas(spark, state)
    merged.write.mode("overwrite").parquet(os.path.join(state, "compact_v1"))
    # no COMPACTED marker written → reader ignores the orphan dir
    assert _rows(spark, state) == before
    # rerunning compaction to completion converges
    assert compact_state(spark, state) == 2
    assert _rows(spark, state) == before
    assert not os.path.exists(os.path.join(state, "d0"))
    shutil.rmtree(state, ignore_errors=True)


def test_as_of_snapshot_reads(spark, tmp_path_factory):
    state = str(tmp_path_factory.mktemp("asof")) + "/idx"
    for i in range(3):
        append_delta(spark, state, _mk(spark, [(i, f"v{i}")]), i)
    df0 = read_deltas(spark, state, as_of=0)
    assert sorted((r.k, r.v) for r in df0.collect()) == [(0, "v0")]
    df1 = read_deltas(spark, state, as_of=1)
    assert sorted((r.k, r.v) for r in df1.collect()) == [(0, "v0"), (1, "v1")]
    # compaction destroys pre-watermark snapshots — loudly, not wrongly
    compact_state(spark, state)
    with pytest.raises(ValueError, match="compacted away"):
        read_deltas(spark, state, as_of=1)
    assert _rows(spark, state) == [(0, "v0"), (1, "v1"), (2, "v2")]


def test_compaction_collects_orphan_compact_dirs(spark, tmp_path_factory):
    """A compaction that crashed after writing its dir but before the
    marker flip leaves an uncommitted orphan; the NEXT successful
    compaction must garbage-collect it."""
    state = str(tmp_path_factory.mktemp("orphan")) + "/idx"
    append_delta(spark, state, _mk(spark, [(0, "v0")]), 0)
    # orphan from a crashed compaction attempt
    _mk(spark, [(0, "v0")]).write.mode("overwrite").parquet(
        os.path.join(state, "compact_v0")
    )
    append_delta(spark, state, _mk(spark, [(1, "v1")]), 1)
    assert compact_state(spark, state) == 2
    assert _rows(spark, state) == [(0, "v0"), (1, "v1")]
    assert not os.path.exists(os.path.join(state, "compact_v0"))
    assert os.path.exists(os.path.join(state, "compact_v1"))


# r16 (VERDICT r15 #2): long referee family - excluded from the
# default fast run; seal runs use -m "slow or not slow".
pytestmark = pytest.mark.slow
