"""Append-only delta state for streaming indexes whose merge is pure
UNION (disjoint rows per micro-batch): MinHash band-key postings,
IVF cell assignments.

Why not the fold-rewrite layout (``rollup_sink.fold_batch``): that
reads the whole stored state, unions the batch, and rewrites
EVERYTHING — O(index) work per micro-batch. Correct and right for the
rollup state (buckets × groups — thousands of rows), but an index that
grows with the corpus (postings, assignments) would pay corpus-sized
I/O per fold. Here a fold only writes its own batch partial::

    state_path/
      CKPT_ID        — identity of the checkpoint appending here
      COMPACTED      — "<batch_id> <dirname>": highest batch id folded
                       and the versioned compact dir holding the merge
                       (one file, flipped atomically — watermark and
                       pointer can never disagree)
      compact_v12/…  — parquet union of all deltas ≤ 12
      d13/…          — per-batch delta (immutable once committed)

Correctness:

- **Idempotency**: a replayed batch overwrites its own ``d{id}`` dir
  with identical rows (at-least-once foreachBatch → same batch id,
  same data) — no watermark read needed on the hot path. A replay of a
  batch already folded into ``compact/`` is skipped via the COMPACTED
  watermark (Spark only replays the LAST uncommitted batch, so this
  only matters when compaction ran mid-stream against operator
  guidance; the guard makes it safe anyway).
- **Atomicity**: Spark's parquet commit protocol marks a complete
  delta with ``_SUCCESS``; readers ignore dirs without it, so a crash
  mid-append leaves a torn dir that is invisible and will be
  overwritten by the replay.
- **Identity**: the CKPT_ID marker fails loudly when a RESET
  checkpoint (batch ids restart at 0) meets surviving deltas — a new
  id-0 batch would otherwise silently overwrite the old ``d0``.

Compaction (``compact_state``) is an OFFLINE maintenance action (run
while the stream is stopped, like any index rebuild): merge all
committed deltas into ``compact/``, flip the COMPACTED watermark via
atomic rename, delete member deltas. Reads before/after see the same
rows. At cluster scale this layout IS how log-structured table formats
work — each delta an appended file set, compaction a rewrite — so the
Delta/Iceberg swap (sources/lakehouse.py) is shape-preserving.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

from rag_lakehouse_spark.streaming.rollup_sink import _local

_CKPT_MARKER = "CKPT_ID"
_COMPACT_MARKER = "COMPACTED"


def _read_marker(root: str, name: str) -> str | None:
    try:
        with open(os.path.join(root, name), encoding="utf-8") as f:
            return f.read().strip() or None
    except OSError:
        return None


def _write_marker(root: str, name: str, value: str) -> None:
    tmp = os.path.join(root, f"_{name}.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(value)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(root, name))  # atomic on POSIX


def _compact_info(root: str) -> tuple[int, str | None]:
    """(watermark batch id, compact dir name) from the atomic marker;
    (-1, None) when no compaction has committed."""
    v = _read_marker(root, _COMPACT_MARKER)
    if v is None:
        return -1, None
    wm, _, name = v.partition(" ")
    return int(wm), (name or None)


def _committed_deltas(root: str) -> list[tuple[int, str]]:
    """(batch_id, abs_dir) of every committed (``_SUCCESS``) delta
    above the compaction watermark, ascending."""
    wm, _ = _compact_info(root)
    out = []
    try:
        entries = os.listdir(root)
    except OSError:
        return []
    for e in entries:
        m = re.fullmatch(r"d(\d+)", e)
        if not m or int(m.group(1)) <= wm:
            continue
        full = os.path.join(root, e)
        if os.path.exists(os.path.join(full, "_SUCCESS")):
            out.append((int(m.group(1)), full))
    return sorted(out)


def append_delta(
    spark: SparkSession,
    state_path: str,
    partial_df: DataFrame,
    batch_id: int,
    ckpt_id: str | None = None,
) -> bool:
    """Write one micro-batch's partial as the immutable delta
    ``d{batch_id}`` — O(batch) work, no read of prior state. Returns
    True iff written (False: the batch is already compacted)."""
    root = _local(state_path)
    os.makedirs(root, exist_ok=True)
    if ckpt_id is not None:
        stored = _read_marker(root, _CKPT_MARKER)
        if stored is None:
            _write_marker(root, _CKPT_MARKER, ckpt_id)
        elif stored != ckpt_id:
            raise ValueError(
                f"checkpoint/state identity mismatch at {state_path}: deltas "
                f"were appended by streaming query {stored!r} but the current "
                f"checkpoint has id {ckpt_id!r}. A reset checkpoint restarts "
                "batch ids at 0 and would overwrite old deltas with new data. "
                "Restore the original checkpoint or delete the state dir."
            )
    if int(batch_id) <= _compact_info(root)[0]:
        return False  # replay of a batch already merged into a compact dir
    partial_df.write.mode("overwrite").parquet(
        os.path.join(state_path, f"d{int(batch_id)}")
    )
    return True


def read_deltas(
    spark: SparkSession, state_path: str, as_of: int | None = None
) -> DataFrame | None:
    """Union of the committed compact dir (if any) and every committed
    delta above the watermark — the full maintained state. None iff
    nothing committed yet.

    ``as_of`` gives snapshot reads: only deltas with batch id ≤ as_of
    (immutable dirs ⇒ the exact state after that batch committed).
    Raises when ``as_of`` predates the compaction watermark — those
    deltas were merged and deleted; keeping every historical snapshot
    readable is a RETENTION policy (what Delta/Iceberg time travel
    configures), not something a compacting index can promise."""
    root = _local(state_path)
    wm, compact_name = _compact_info(root)
    if as_of is not None and as_of < wm:
        raise ValueError(
            f"cannot read {state_path} as of batch {as_of}: deltas up to "
            f"batch {wm} were compacted away. Snapshot retention beyond "
            "the compaction watermark needs a transactional table format."
        )
    paths = []
    if compact_name is not None and os.path.exists(
        os.path.join(root, compact_name, "_SUCCESS")
    ):
        paths.append(os.path.join(state_path, compact_name))
    paths.extend(
        os.path.join(state_path, os.path.basename(d))
        for bid, d in _committed_deltas(root)
        if as_of is None or bid <= as_of
    )
    if not paths:
        return None
    return spark.read.parquet(*paths)


def compact_state(spark: SparkSession, state_path: str) -> int:
    """OFFLINE compaction (run while the stream is stopped, like any
    index rebuild): merge the current compact dir + all committed
    deltas into a NEW versioned compact dir, then commit watermark and
    pointer together in one atomic marker replace, then delete the
    merged inputs. Returns the number of deltas merged.

    A crash at ANY point leaves a readable, complete state: before the
    marker flip the old marker + old dirs are untouched; after it the
    new dir is committed and the leftover old dirs are invisible
    garbage (cleaned on the next compaction)."""
    root = _local(state_path)
    deltas = _committed_deltas(root)
    if not deltas:
        return 0
    merged = read_deltas(spark, state_path)
    new_id = deltas[-1][0]
    new_name = f"compact_v{new_id}"
    merged.write.mode("overwrite").parquet(os.path.join(state_path, new_name))
    _write_marker(root, _COMPACT_MARKER, f"{new_id} {new_name}")
    # best-effort GC of superseded inputs (crash here is harmless):
    # every compact_v* except the just-committed one — this also
    # collects ORPHANS from earlier compactions that crashed after
    # writing their dir but before the marker flip
    for e in os.listdir(root):
        if (
            re.fullmatch(r"compact_v\d+", e)
            and e != new_name
        ):
            shutil.rmtree(os.path.join(root, e), ignore_errors=True)
    for _, d in deltas:
        shutil.rmtree(d, ignore_errors=True)
    return len(deltas)
