"""Incremental maintenance of the rollup hierarchy under a stream —
the streaming twin of ``operators.rollup.time_rollup``.

Each micro-batch folds into the STORED finest-grain partial table
(read → union → re-aggregate → atomic-ish overwrite); coarser grains
re-derive from the stored partials on demand. All measures are
mergeable by construction — counts/sums add, HLL sketches union — so
arrival order and batch boundaries cannot change the result: the
maintained hierarchy equals the batch rollup over the same rows
(asserted in tests/test_streaming_rollup.py with a multi-batch
availableNow replay).

At 100 TB the stored partial table IS the continuous aggregate: its
size is buckets × groups (thousands of rows), each merge touches one
micro-batch of raw data plus that small table, and the raw history is
never re-scanned. The same mergeability argument that makes the batch
cascade correct makes the incremental fold correct.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the maintained partial schema: bucket_start, n_events, total_value
# (decimal partial), user_sketch (HLL binary), last_batch_id (the
# idempotency watermark — constant across rows of one state version)


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


def _read_state(spark: SparkSession, state_path: str) -> DataFrame | None:
    """Read the maintained state table, returning None iff the path
    does not exist yet (first batch). Any OTHER read error — permission
    trouble, corrupt footer, transient storage failure — raises: the
    old blanket ``except`` silently reset state to empty and dropped
    all folded history on a hiccup."""
    try:
        return spark.read.parquet(state_path)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return None
        raise


def fold_batch(
    spark: SparkSession, state_path: str, batch_df: DataFrame, batch_id: int
) -> bool:
    """Fold one micro-batch's hour partials into the state table.
    Idempotent under foreachBatch's at-least-once contract: the state
    carries the last applied ``batch_id``, and a batch replayed after a
    failure between the state overwrite and the checkpoint commit is
    skipped instead of double-counted. Returns True iff folded.

    Spark assigns batch ids monotonically from the checkpoint, so
    ``applied >= batch_id`` ⇔ this exact batch already folded."""
    prev = _read_state(spark, state_path)
    if prev is not None:
        applied = prev.agg(F.max("last_batch_id")).first()[0]
        if applied is not None and applied >= batch_id:
            return False
        prev = prev.drop("last_batch_id")
    partial = _batch_partials(batch_df)
    merged = _merge(prev, partial) if prev is not None else _merge(partial.limit(0), partial)
    merged = merged.withColumn("last_batch_id", F.lit(int(batch_id)).cast("bigint"))
    # materialize BEFORE overwriting the path being read
    merged = merged.localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(state_path)
    return True


def maintain_hourly_rollup(
    spark: SparkSession, events_stream: DataFrame, state_path: str
):
    """Start a foreachBatch query folding each micro-batch's hour
    partials into the parquet state table at ``state_path``. Returns
    the StreamingQuery (caller awaits termination)."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        fold_batch(spark, state_path, batch_df, batch_id)

    return (
        events_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", state_path + "_ckpt")
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
    level = spark.read.parquet(state_path).drop("last_batch_id")
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
