"""Incremental maintenance of the rollup hierarchy under a stream —
the streaming twin of ``operators.rollup.time_rollup``.

Each micro-batch folds into the STORED finest-grain partial table
(read → union → re-aggregate → versioned write + atomic pointer flip);
coarser grains re-derive from the stored partials on demand. All
measures are mergeable by construction — counts/sums add, HLL sketches
union — so arrival order and batch boundaries cannot change the
result: the maintained hierarchy equals the batch rollup over the same
rows (asserted in tests/test_streaming_rollup.py with a multi-batch
availableNow replay).

State layout (local filesystem)::

    state_path/
      CURRENT      — text file naming the live version dir ("v12")
      v12/…        — parquet partials written by batch 12
      v7/…         — superseded version (garbage-collected best-effort)

The pointer flip is ``os.replace`` (atomic on POSIX), so a crash at
ANY point leaves a readable state: mid-write of the new version dir,
``CURRENT`` still names the old one; after the flip, the replayed
batch is skipped by the watermark. A plain ``mode("overwrite")`` of a
single state dir — the previous design — deletes the old files before
the new ones commit, so a crash mid-overwrite silently dropped ALL
folded history. At real scale the same two-phase shape is what a
transactional table format (Delta/Iceberg snapshot swap; see
sources/lakehouse.py) provides natively.

At 100 TB the stored partial table IS the continuous aggregate: its
size is buckets × groups (thousands of rows), each merge touches one
micro-batch of raw data plus that small table, and the raw history is
never re-scanned. The same mergeability argument that makes the batch
cascade correct makes the incremental fold correct.
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the maintained partial schema: bucket_start, n_events, total_value
# (decimal partial), user_sketch (HLL binary), last_batch_id (the
# idempotency watermark — constant across rows of one state version),
# ckpt_id (identity of the checkpoint that built the state — constant)

_CURRENT = "CURRENT"


def _local(path: str) -> str:
    """Strip a file: scheme; the versioned-pointer layout is local-fs
    (tests, local[...] jobs). An object-store deployment swaps this
    sink for the transactional-format writer (sources/lakehouse.py)."""
    if path.startswith("file://"):
        return path[len("file://") :]
    if path.startswith("file:"):
        return path[len("file:") :]
    return path


def _pointer_info(state_path: str) -> tuple[str | None, int | None, str | None]:
    """(live version dir, last folded batch id, checkpoint id) from the
    CURRENT pointer. Since r15 the pointer is a JSON object carrying
    the idempotency watermark and checkpoint identity alongside the
    version name, so a fold reads its watermark with zero Spark jobs —
    at scale the old path re-scanned the whole state parquet per
    micro-batch just to fetch two constants (guide §5: the driver/agg
    pass was pure overhead). A legacy plain-string pointer (pre-r15
    state) yields (version, None, None) and the fold falls back to
    reading the constants from the state's data columns, which are
    still written for exactly that compatibility."""
    cur = os.path.join(_local(state_path), _CURRENT)
    try:
        with open(cur, encoding="utf-8") as f:
            raw = f.read().strip()
    except OSError:
        return None, None, None
    if not raw:
        return None, None, None
    if raw.startswith("{"):
        try:
            obj = json.loads(raw)
        except ValueError:
            return None, None, None
        batch = obj.get("batch")
        return (
            obj.get("v") or None,
            int(batch) if batch is not None else None,
            obj.get("ckpt"),
        )
    return raw, None, None  # legacy plain version-name pointer


def _write_pointer(
    root: str,
    version: str,
    batch_id: int | None,
    ckpt_id: str | None,
    tag: str,
) -> None:
    """Atomically flip the CURRENT pointer to ``version``, embedding
    the watermark + checkpoint identity (see ``_pointer_info``)."""
    tmp = os.path.join(root, f"_{_CURRENT}.{tag}.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(json.dumps({"v": version, "batch": batch_id, "ckpt": ckpt_id}))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(root, _CURRENT))  # atomic on POSIX


def _version_dir(state_path: str) -> str | None:
    """Name of the live version dir per the CURRENT pointer, or None."""
    return _pointer_info(state_path)[0]


def _batch_partials(df: DataFrame, grain: str = "hour") -> DataFrame:
    return df.groupBy(F.date_trunc(grain, F.col("ts")).alias("bucket_start")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,2)")).alias("total_value"),
        F.hll_sketch_agg("user_id").alias("user_sketch"),
    )


def _merge(prev: DataFrame, batch: DataFrame) -> DataFrame:
    return (
        prev.unionByName(batch)
        .groupBy("bucket_start")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("total_value").cast("decimal(22,2)").alias("total_value"),
            F.hll_union_agg("user_sketch").alias("user_sketch"),
        )
    )


def read_state(spark: SparkSession, state_path: str) -> DataFrame | None:
    """Read the maintained state table (the live version under the
    CURRENT pointer; legacy flat layout tolerated), returning None iff
    no state exists yet (first batch). Any OTHER read error —
    permission trouble, corrupt footer, transient storage failure —
    raises: silently resetting state to empty would drop all folded
    history on a hiccup.

    Reader contract: the returned DataFrame is lazy and resolves to
    the version dir current at CALL time. GC keeps one superseded
    version (N-1), so the plan survives exactly one further fold; a
    consumer that may lag more than one fold behind concurrent
    ingestion must re-call read_state per query."""
    v = _version_dir(state_path)
    if v is not None:
        return spark.read.parquet(os.path.join(state_path, v))
    try:
        entries = os.listdir(_local(state_path))
    except FileNotFoundError:
        if state_path.startswith("file:") or "://" not in state_path:
            # Local layout (the module's contract) with no state root at
            # all: unambiguously first-batch. Returning here instead of
            # falling through to the flat parquet read avoids Spark
            # logging a scary (but handled) FileNotFoundException inside
            # every streaming query's first micro-batch.
            return None
        entries = None
    except OSError:
        entries = None
    if entries is not None and all(
        re.fullmatch(r"v\d+", e) or e.endswith(".tmp") or e == _CURRENT
        for e in entries
    ):
        # Versioned layout with no committed pointer: a crash between
        # the very first v0 write and the first CURRENT flip leaves
        # only uncommitted v*/tmp entries (or an empty dir). Committed
        # state is pointer-or-nothing — never flat-read an uncommitted
        # version dir as if it were folded history.
        return None
    try:
        return spark.read.parquet(state_path)  # legacy flat layout
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return None
        raise


# back-compat alias (tests and older callers)
_read_state = read_state


def fold_batch(
    spark: SparkSession,
    state_path: str,
    batch_df: DataFrame,
    batch_id: int,
    ckpt_id: str | None = None,
    partial_fn=_batch_partials,
    merge_fn=_merge,
) -> bool:
    """Fold one micro-batch's partials into the state table.

    ``partial_fn(batch_df)`` aggregates a micro-batch to the mergeable
    partial schema and ``merge_fn(prev, partial)`` folds partials
    together; the defaults maintain the hourly rollup. Other mergeable
    aggregations (e.g. the streaming dedup index in
    ``streaming.dedup_sink``) pass their own pair — the versioning,
    idempotency, and checkpoint-identity machinery below is shared.

    Idempotent under foreachBatch's at-least-once contract: the state
    carries the last applied ``batch_id``, and a batch replayed after a
    failure between the state pointer flip and the checkpoint commit is
    skipped instead of double-counted. Returns True iff folded.

    Spark assigns batch ids monotonically from the checkpoint, so
    ``applied >= batch_id`` ⇔ this exact batch already folded — but
    ONLY while the checkpoint that numbered the stored batches is the
    one still running. ``ckpt_id`` (the streaming query id persisted in
    the checkpoint's metadata file) guards that assumption: a RESET
    checkpoint restarts batch ids at 0 against surviving state, where
    the watermark would silently skip every replayed batch (or, worse,
    double-count once ids pass the stale watermark). On mismatch this
    raises instead — the operator must restore the original checkpoint
    or delete the state table; no silent choice is correct.

    Durability: the merged state writes to a NEW ``v{batch_id}`` dir,
    then the CURRENT pointer flips via atomic rename. A crash mid-write
    leaves CURRENT on the old version — no data loss; superseded
    version dirs are garbage-collected best-effort after the flip,
    KEEPING the immediately superseded version (N-1): a lazy reader
    that resolved CURRENT before this fold survives one further fold
    before its files disappear. Readers that lag more than one fold
    behind (concurrent serve-while-ingest with slow consumers) must
    re-call ``read_state`` per query.
    """
    prev = read_state(spark, state_path)
    prev_version, ptr_batch, ptr_ckpt = _pointer_info(state_path)
    if prev is not None:
        if prev_version is not None and ptr_batch is not None:
            # r15 pointer carries watermark + identity: zero Spark jobs
            # to decide skip/fold (the old path ran a first() and a
            # max() over the WHOLE state parquet per micro-batch)
            stored, applied = ptr_ckpt, ptr_batch
            if stored is None and ckpt_id is not None and "ckpt_id" in prev.columns:
                # ADVICE r15 #3: a prior fold that ran with
                # ckpt_id=None wrote a null ckpt into the pointer; do
                # not let that null disarm the reset-checkpoint guard
                # for callers that DO pass an identity — fall back to
                # the data-column ckpt_id for the mismatch check (one
                # constant-column first(), only on this rare path; the
                # next successful fold re-arms the pointer).
                row = prev.select("ckpt_id").first()
                stored = row[0] if row is not None else None
        else:
            # legacy state (plain pointer / flat layout): constants
            # still live in the data columns. Read the identity even
            # when this caller passes none — the fold below carries it
            # forward into the new version (ADVICE r15 #3), and this
            # legacy read happens at most once per state (the pointer
            # carries it from then on).
            if "ckpt_id" in prev.columns:
                # a zero-row state (all-empty batches so far) has no
                # ckpt_id row to check — first() is None, not a Row
                row = prev.select("ckpt_id").first()
                stored = row[0] if row is not None else None
            else:
                stored = None
            applied = prev.agg(F.max("last_batch_id")).first()[0]
        if ckpt_id is not None and stored is not None and stored != ckpt_id:
            raise ValueError(
                f"checkpoint/state identity mismatch at {state_path}: "
                f"state was built by streaming query {stored!r} but the "
                f"current checkpoint has id {ckpt_id!r}. A reset "
                "checkpoint restarts batch ids at 0, so the stored "
                "watermark cannot deduplicate replays. Restore the "
                "original checkpoint or delete the state table."
            )
        if applied is not None and applied >= batch_id:
            return False
        prev = prev.drop("last_batch_id", "ckpt_id")
    else:
        stored = None
    # ADVICE r15 #3 (write side): a fold invoked WITHOUT an identity
    # (ckpt_id=None — maintenance/manual folds) must not ERASE the
    # stored identity: writing null into the pointer and data column
    # would disarm the reset-checkpoint guard for every later fold
    # that does pass one. Carry the stored identity forward instead;
    # the guard above already proved there is no conflict.
    keep_ckpt = ckpt_id if ckpt_id is not None else stored
    partial = partial_fn(batch_df)
    merged = (
        merge_fn(prev, partial)
        if prev is not None
        else merge_fn(partial.limit(0), partial)
    )
    merged = merged.withColumn(
        "last_batch_id", F.lit(int(batch_id)).cast("bigint")
    ).withColumn("ckpt_id", F.lit(keep_ckpt).cast("string"))

    # two-phase commit: write the new version beside the old one (the
    # read plan above still streams from the old dir — no self-
    # overwrite, no extra materialization), then flip the pointer.
    root = _local(state_path)
    new_version = f"v{int(batch_id)}"
    merged.write.mode("overwrite").parquet(os.path.join(state_path, new_version))
    _write_pointer(root, new_version, int(batch_id), keep_ckpt, str(int(batch_id)))

    # Best-effort GC of superseded versions (crash here is harmless),
    # deferred by ONE version: the immediately superseded dir is kept
    # so a lazy DataFrame handed out by read_state before this fold
    # (resolved to the old version dir) still executes if one more
    # batch folds before the consumer runs. Versions older than N-1
    # are removed.
    keep = {new_version, prev_version}
    try:
        entries = os.listdir(root)
    except OSError:
        entries = []
    for e in entries:
        if re.fullmatch(r"v\d+", e) and e not in keep:
            shutil.rmtree(os.path.join(root, e), ignore_errors=True)
    return True


def compact_fold_state(spark: SparkSession, state_path: str) -> bool:
    """OFFLINE compaction for the fold-rewrite layout (VERDICT r11 #5)
    — run while the stream is stopped, like ``append_state
    .compact_state`` for the append layout: rewrite the live version
    as the canonical ``v0``, flip the pointer, drop every predecessor.
    Returns True iff a compaction happened (False: no state yet, or
    already compact).

    What it buys: the state becomes a single self-contained "model
    table" dir whose name no longer encodes ingestion history — the
    checkpointed-model-table contract (SCALE.md): archivable, copyable
    to a serving cluster, and the version-number monotonicity resets.
    The idempotency watermark (``last_batch_id``) and checkpoint
    identity (``ckpt_id``) live in the DATA columns, not the dir name,
    so replay semantics are untouched: a resumed stream's next fold
    (batch id > watermark) writes ``v{id}`` beside ``v0`` exactly as
    before, and a replayed already-folded batch is still skipped.

    Crash-safe at every point like ``fold_batch``: before the pointer
    flip, CURRENT still names the old live dir and the half-written
    ``v0`` is invisible garbage (overwritten by the next attempt);
    after the flip, ``v0`` is committed and the old dirs are invisible
    garbage (GC'd best-effort below). Lazy DataFrames resolved before
    compaction lose their files immediately — the offline contract
    (readers re-resolve via ``read_state`` after maintenance), same as
    the append layout's."""
    live, ptr_batch, ptr_ckpt = _pointer_info(state_path)
    if live is None or live == "v0":
        return False
    root = _local(state_path)
    spark.read.parquet(os.path.join(state_path, live)).write.mode(
        "overwrite"
    ).parquet(os.path.join(state_path, "v0"))
    # carry the watermark + identity across the compaction boundary (a
    # legacy plain pointer has neither — the data columns still do, and
    # the next fold falls back to reading them)
    _write_pointer(root, "v0", ptr_batch, ptr_ckpt, "compact")
    try:
        entries = os.listdir(root)
    except OSError:
        entries = []
    for e in entries:
        if re.fullmatch(r"v\d+", e) and e != "v0":
            shutil.rmtree(os.path.join(root, e), ignore_errors=True)
    return True


def _ckpt_query_id(checkpoint_location: str) -> str | None:
    """The streaming query id persisted in the checkpoint's metadata
    file — stable across restarts from the same checkpoint, regenerated
    when the checkpoint is reset. None if unreadable (no identity check
    then; non-local checkpoint stores would need an FS client here)."""
    try:
        with open(
            os.path.join(_local(checkpoint_location), "metadata"), encoding="utf-8"
        ) as f:
            return json.load(f).get("id")
    except (OSError, ValueError):
        return None


def maintain_hourly_rollup(
    spark: SparkSession, events_stream: DataFrame, state_path: str
):
    """Start a foreachBatch query folding each micro-batch's hour
    partials into the parquet state table at ``state_path``. Returns
    the StreamingQuery (caller awaits termination)."""
    ckpt = state_path + "_ckpt"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        # read per batch: the metadata file exists once the query runs
        fold_batch(spark, state_path, batch_df, batch_id, _ckpt_query_id(ckpt))

    return (
        events_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def rollup_hierarchy_from_state(
    spark: SparkSession, state_path: str, grains: tuple[str, ...] = ("hour", "day", "month")
) -> DataFrame:
    """Derive the full grain hierarchy from the maintained finest-grain
    partials — the serving-side read. Output matches
    ``events_rollup_distinct_sketch``-style columns:
    (grain, bucket_start, n_events, total_value, approx_users)."""
    state = read_state(spark, state_path)
    if state is None:
        raise FileNotFoundError(f"no rollup state at {state_path}")
    level = state.drop("last_batch_id", "ckpt_id")
    out = None
    for g in grains:
        if g != grains[0]:
            level = level.groupBy(
                F.date_trunc(g, F.col("bucket_start")).alias("bucket_start")
            ).agg(
                F.sum("n_events").cast("bigint").alias("n_events"),
                F.sum("total_value").cast("decimal(22,2)").alias("total_value"),
                F.hll_union_agg("user_sketch").alias("user_sketch"),
            )
        if g != grains[-1]:
            # each level feeds both the output union and the next grain
            level = level.localCheckpoint(eager=True)
        fin = level.select(
            F.lit(g).alias("grain"),
            "bucket_start",
            "n_events",
            F.col("total_value").cast("double").alias("total_value"),
            F.hll_sketch_estimate("user_sketch").alias("approx_users"),
        )
        out = fin if out is None else out.unionByName(fin)
    return out


def _daily_type_partials(df: DataFrame) -> DataFrame:
    return df.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))


def _daily_type_merge(prev: DataFrame, batch: DataFrame) -> DataFrame:
    return (
        prev.unionByName(batch)
        .groupBy("event_type", "d")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )


def maintain_daily_type_counts(
    spark: SparkSession, events_stream: DataFrame, state_path: str
):
    """Fold each micro-batch's per-(event_type, day) counts into the
    versioned state table — the aggregated-state layout (state size is
    bounded by types × calendar days, so the fold-rewrite IS the
    compaction; see docs/SCALE.md layout-choice rule). Counts are
    mergeable, so any serving computation over the state (EWMA, CUSUM,
    trend) is exact however ingestion was batched."""
    ckpt = state_path + "_ckpt"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        fold_batch(
            spark,
            state_path,
            batch_df,
            batch_id,
            _ckpt_query_id(ckpt),
            partial_fn=_daily_type_partials,
            merge_fn=_daily_type_merge,
        )

    return (
        events_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def _activity_partials(df: DataFrame) -> DataFrame:
    return (
        df.filter(F.col("user_id").isNotNull())
        .select(
            "user_id",
            F.date_trunc("day", F.col("ts")).cast("date").alias("d"),
        )
        .distinct()
    )


def _activity_merge(prev: DataFrame, batch: DataFrame) -> DataFrame:
    return prev.unionByName(batch).distinct()


def maintain_user_activity(
    spark: SparkSession, events_stream: DataFrame, state_path: str
):
    """Fold each micro-batch's distinct (user_id, day) activity pairs
    into the versioned state table. Set-union is idempotent AND
    mergeable, so any serving computation over the state (DAU/WAU/MAU,
    retention, churn) is exact however ingestion was batched. State
    size is bounded by users × active days — the aggregated-state
    layout (fold-rewrite is the compaction), same choice as the daily
    counts; a deployment with billions of users per day would shard
    the state table by day partition, not change the fold."""
    ckpt = state_path + "_ckpt"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        fold_batch(
            spark,
            state_path,
            batch_df,
            batch_id,
            _ckpt_query_id(ckpt),
            partial_fn=_activity_partials,
            merge_fn=_activity_merge,
        )

    return (
        events_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def _hll_partials(df: DataFrame) -> DataFrame:
    """Micro-batch → maxed portable-HLL registers (event_type, idx,
    reg_max). The hash runs once per event, at ingest; the partial is
    at most |types| x 256 rows."""
    from rag_lakehouse_spark.plans.advanced_queries import hll_register_rows

    return (
        hll_register_rows(df)
        .groupBy("event_type", "idx")
        .agg(F.max("rho").alias("reg_max"))
    )


def _hll_merge(prev: DataFrame, batch: DataFrame) -> DataFrame:
    return (
        prev.unionByName(batch)
        .groupBy("event_type", "idx")
        .agg(F.max("reg_max").alias("reg_max"))
    )


def maintain_hll_registers(
    spark: SparkSession, events_stream: DataFrame, state_path: str
):
    """Fold each micro-batch's portable-HLL register maxima into the
    versioned state table. Register max is idempotent AND mergeable
    (re-observing a user cannot raise a register past its true value),
    so the maintained registers equal the one-shot batch registers
    however ingestion was batched — which is what lets
    ``events_hll_incremental`` share the batch twin's oracle. State is
    bounded at |types| x 256 rows regardless of history size."""
    ckpt = state_path + "_ckpt"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        fold_batch(
            spark,
            state_path,
            batch_df,
            batch_id,
            _ckpt_query_id(ckpt),
            partial_fn=_hll_partials,
            merge_fn=_hll_merge,
        )

    return (
        events_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def read_hll_registers(spark: SparkSession, state_path: str) -> DataFrame:
    """The maintained registers as a batch DataFrame:
    (event_type, idx, reg_max)."""
    state = read_state(spark, state_path)
    if state is None:
        raise FileNotFoundError(f"no HLL register state at {state_path}")
    return state.select("event_type", "idx", "reg_max")


def _cms_partials(df: DataFrame) -> DataFrame:
    """Micro-batch of documents → CMS counter partials (j, idx, c).
    The batch tokenizes and hashes ONCE; the partial is at most
    d*w = 2048 rows."""
    from rag_lakehouse_spark.functions import text as TX
    from rag_lakehouse_spark.operators.cms import cms_build

    toks = df.select(
        F.explode(TX.tokens(F.coalesce(F.col("text"), F.lit("")))).alias("t")
    ).filter(F.col("t") != "")
    return cms_build(toks, "t")


def _cms_merge(prev: DataFrame, batch: DataFrame) -> DataFrame:
    return (
        prev.unionByName(batch)
        .groupBy("j", "idx")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )


def maintain_cms_counters(
    spark: SparkSession, docs_stream: DataFrame, state_path: str
):
    """Fold each micro-batch's count-min counter partials into the
    versioned state table. Counter SUMS are mergeable (and the
    fold-watermark makes the at-least-once replay exactly-once, same
    as the daily-count state), so the maintained sketch equals the
    one-shot batch sketch however ingestion was batched — which is
    what lets ``corpus_cms_incremental`` share the batch twin's
    oracle. State is bounded at d*w = 2048 rows regardless of corpus
    size."""
    ckpt = state_path + "_ckpt"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        fold_batch(
            spark,
            state_path,
            batch_df,
            batch_id,
            _ckpt_query_id(ckpt),
            partial_fn=_cms_partials,
            merge_fn=_cms_merge,
        )

    return (
        docs_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def read_cms_counters(spark: SparkSession, state_path: str) -> DataFrame:
    """The maintained sketch as a batch DataFrame: (j, idx, c)."""
    state = read_state(spark, state_path)
    if state is None:
        raise FileNotFoundError(f"no CMS counter state at {state_path}")
    return state.select("j", "idx", "c")


def _bloom_partials(df: DataFrame) -> DataFrame:
    """Micro-batch of keys (first column) → Bloom word partials
    (word, w) via the SAME packing helper the batch build collects
    (``bloom.bloom_word_partials`` — one definition, so batch and
    maintained bitmaps cannot diverge). The batch hashes ONCE; the
    partial is at most N_WORDS = 128 rows."""
    from rag_lakehouse_spark.operators.bloom import bloom_word_partials

    return bloom_word_partials(df, df.columns[0])


def _bloom_merge(prev: DataFrame, batch: DataFrame) -> DataFrame:
    return (
        prev.unionByName(batch)
        .groupBy("word")
        .agg(F.bit_or("w").alias("w"))
    )


def maintain_bloom_words(
    spark: SparkSession, keys_stream: DataFrame, state_path: str
):
    """Fold each micro-batch's Bloom bit positions into the versioned
    state table. Bitwise OR is idempotent AND mergeable (re-observing
    a key sets the same bits), so the maintained bitmap equals the
    batch-built bitmap however ingestion was batched — which is what
    lets ``join_bloom_incremental`` share the batch twin's oracle.
    State is bounded at N_WORDS = 128 rows regardless of key
    history."""
    ckpt = state_path + "_ckpt"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        fold_batch(
            spark,
            state_path,
            batch_df,
            batch_id,
            _ckpt_query_id(ckpt),
            partial_fn=_bloom_partials,
            merge_fn=_bloom_merge,
        )

    return (
        keys_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def read_bloom_words(spark: SparkSession, state_path: str) -> DataFrame:
    """The maintained bitmap as a batch DataFrame: (word, w)."""
    state = read_state(spark, state_path)
    if state is None:
        raise FileNotFoundError(f"no Bloom word state at {state_path}")
    return state.select("word", "w")


def _wsample_partials(df: DataFrame) -> DataFrame:
    """Micro-batch of documents → its bottom-100 race-key rows
    (doc_id, n_chars, sample_key). The keys are deterministic, so the
    partial is itself a valid sample of the batch."""
    from rag_lakehouse_spark.plans.corpus_queries import (
        bottom_k_sample,
        weighted_sample_keys,
    )

    return bottom_k_sample(weighted_sample_keys(df))


def _wsample_merge(prev: DataFrame, batch: DataFrame) -> DataFrame:
    from rag_lakehouse_spark.plans.corpus_queries import bottom_k_sample

    # dropDuplicates makes the fold idempotent under overlapping
    # replays (a doc re-observed carries the IDENTICAL deterministic
    # key row); min-k of a union == min-k of min-ks.
    return bottom_k_sample(
        prev.unionByName(batch).dropDuplicates(["doc_id"])
    )


def maintain_weighted_sample(
    spark: SparkSession, docs_stream: DataFrame, state_path: str
):
    """Fold each micro-batch's bottom-k race keys into the versioned
    state table. Bottom-k under a deterministic total order is
    idempotent AND mergeable (union + re-take), so the maintained
    sample provably equals the one-shot batch sample however ingestion
    was batched — which is what lets ``corpus_sample_incremental``
    share the batch twin's oracle. State is bounded at k = 100 rows
    regardless of corpus size."""
    ckpt = state_path + "_ckpt"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        fold_batch(
            spark,
            state_path,
            batch_df,
            batch_id,
            _ckpt_query_id(ckpt),
            partial_fn=_wsample_partials,
            merge_fn=_wsample_merge,
        )

    return (
        docs_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def read_weighted_sample(spark: SparkSession, state_path: str) -> DataFrame:
    """The maintained sample as a batch DataFrame:
    (doc_id, n_chars, sample_key)."""
    state = read_state(spark, state_path)
    if state is None:
        raise FileNotFoundError(f"no weighted-sample state at {state_path}")
    return state.select("doc_id", "n_chars", "sample_key")


def _encoding_partials(df: DataFrame) -> DataFrame:
    """Micro-batch of (doc_id, text, source) → per-source encoding
    counter partials via the SAME inject+detect step the batch report
    aggregates (``operators.text.encoding_defect_flags`` — one
    definition, so batch and maintained counters cannot diverge)."""
    from rag_lakehouse_spark.operators.text import encoding_defect_flags

    flags = encoding_defect_flags(df)
    clean = ~F.col("rep") & ~F.col("moj") & ~F.col("ctl")
    return flags.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col("rep").cast("int")).cast("bigint").alias("n_replacement"),
        F.sum(F.col("moj").cast("int")).cast("bigint").alias("n_mojibake"),
        F.sum(F.col("ctl").cast("int")).cast("bigint").alias("n_control"),
        F.sum(clean.cast("int")).cast("bigint").alias("n_clean"),
    )


def _encoding_merge(prev: DataFrame, batch: DataFrame) -> DataFrame:
    return (
        prev.unionByName(batch)
        .groupBy("source")
        .agg(
            *[
                F.sum(c).cast("bigint").alias(c)
                for c in (
                    "n_docs",
                    "n_replacement",
                    "n_mojibake",
                    "n_control",
                    "n_clean",
                )
            ]
        )
    )


def maintain_encoding_counters(
    spark: SparkSession, docs_stream: DataFrame, state_path: str
):
    """Fold each micro-batch's per-source encoding-health counters into
    the versioned state table — the TENTH incremental-index family.
    Counter SUMS are mergeable and the fold-watermark makes the
    at-least-once replay exactly-once (SUM merge class: watermarked,
    NOT naturally idempotent — same replay contract as the CMS/daily
    counters), so the maintained counters equal the one-shot batch
    report however ingestion was batched — which is what lets
    ``text_encoding_incremental`` share the batch twin's oracle. State
    is bounded at |sources| rows regardless of corpus size."""
    ckpt = state_path + "_ckpt"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        fold_batch(
            spark,
            state_path,
            batch_df,
            batch_id,
            _ckpt_query_id(ckpt),
            partial_fn=_encoding_partials,
            merge_fn=_encoding_merge,
        )

    return (
        docs_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def read_encoding_counters(spark: SparkSession, state_path: str) -> DataFrame:
    """The maintained counters as a batch DataFrame:
    (source, n_docs, n_replacement, n_mojibake, n_control, n_clean)."""
    state = read_state(spark, state_path)
    if state is None:
        raise FileNotFoundError(f"no encoding counter state at {state_path}")
    return state.select(
        "source", "n_docs", "n_replacement", "n_mojibake", "n_control", "n_clean"
    )
