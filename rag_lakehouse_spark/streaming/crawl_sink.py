"""Incremental crawl-to-corpus accounting — the THIRTEENTH
incremental-index family: ``plans.crawl_queries.corpus_from_crawl``'s
full bucket report (HTTP-status / blocklist / encoding / quality
gates, exact dedup, shard assignment, per-bucket doc/char/host/
fingerprint accounting) maintained under continuous archive ingest
and served from state — proving the capstone itself, not just its
stages, survives streaming.

The fold is FULLY ORDER-INDEPENDENT — no arrival-order contract, no
batch-boundary sensitivity — because the state stores mergeable
partials from which EVERY bucket derives at read time:

- ``gate`` rows, keyed (reason, host): SUM-merged doc/char/
  fingerprint-lane counters for gate-dropped fetches (their bucket is
  decided per-row at ingest and never changes).
- ``fp`` rows, keyed (fingerprint, host) over gate SURVIVORS: copy
  count and char mass (SUM-merged) plus the smallest crawl_id seen
  for that (fp, host) and its char length (MIN/min_by-merged). The
  canonical copy of a fingerprint — min crawl_id GLOBALLY — is a
  DERIVED quantity: a window over the state picks it at read, so a
  smaller id arriving in any later batch retroactively reassigns the
  canonical without any stored bucket ever having been wrong.

Read-time derivation: canonical rows land in their shard bucket (the
shared ``_shard_bucket`` hash); every other copy lands in
'drop:duplicate'; gate rows land in their 'drop:<reason>' bucket —
and the result equals the one-shot batch report EXACTLY, so the
streaming twin runs under the capstone's SAME DuckDB oracle.

State: the fold-rewrite layout of ``streaming.rollup_sink``
(versioned dirs, atomic pointer, idempotency watermark, checkpoint
identity, ``compact_fold_state``). Per-batch ingest cost is one
archive walk + gate scan over the batch (parse-once: bytes never
enter state) plus a merge against |distinct (fp, host)| + |reasons ×
hosts| state rows — the dedup-index scale, the same argument as
``streaming.dedup_sink``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from rag_lakehouse_spark.streaming.rollup_sink import (
    _ckpt_query_id,
    fold_batch,
    read_state,
)

_M30 = (1 << 30) - 1


def _crawl_partials(spark: SparkSession, batch_df: DataFrame) -> DataFrame:
    """One micro-batch of (crawl_id, text, archive_id) fetch rows →
    unified mergeable state rows, via the SAME extract + gate
    definitions the batch capstone runs (the twins cannot drift)."""
    from rag_lakehouse_spark.plans.crawl_queries import (
        _crawl_extract,
        _crawl_gate,
    )

    g = _crawl_gate(spark, _crawl_extract(batch_df))
    gate = (
        g.filter(F.col("reason").isNotNull())
        .groupBy("reason", "host")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("n").cast("bigint").alias("chars_sum"),
            F.sum(F.shiftright("fp", 30)).cast("bigint").alias("fp_hi_sum"),
            F.sum(F.col("fp").bitwiseAND(F.lit(_M30)))
            .cast("bigint")
            .alias("fp_lo_sum"),
        )
        .select(
            F.lit("gate").alias("kind"),
            "reason",
            "host",
            F.lit(None).cast("bigint").alias("fp"),
            "n",
            "chars_sum",
            "fp_hi_sum",
            "fp_lo_sum",
            F.lit(None).cast("bigint").alias("min_cid"),
            F.lit(None).cast("bigint").alias("min_cid_chars"),
        )
    )
    fph = (
        g.filter(F.col("reason").isNull())
        .groupBy("fp", "host")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("n").cast("bigint").alias("chars_sum"),
            F.min("crawl_id").cast("bigint").alias("min_cid"),
            F.min_by("n", "crawl_id").cast("bigint").alias("min_cid_chars"),
        )
        .select(
            F.lit("fp").alias("kind"),
            F.lit(None).cast("string").alias("reason"),
            "host",
            "fp",
            "n",
            "chars_sum",
            F.lit(None).cast("bigint").alias("fp_hi_sum"),
            F.lit(None).cast("bigint").alias("fp_lo_sum"),
            "min_cid",
            "min_cid_chars",
        )
    )
    return gate.unionByName(fph)


def _crawl_merge(prev: DataFrame, batch: DataFrame) -> DataFrame:
    """Merge state partials: counters SUM, the per-(fp, host) smallest
    crawl_id and its char length travel together via min/min_by —
    every field mergeable, so arrival order and batch boundaries
    cannot change the derived report."""
    return (
        prev.unionByName(batch)
        .groupBy("kind", "reason", "host", "fp")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("chars_sum").cast("bigint").alias("chars_sum"),
            F.sum("fp_hi_sum").cast("bigint").alias("fp_hi_sum"),
            F.sum("fp_lo_sum").cast("bigint").alias("fp_lo_sum"),
            F.min("min_cid").cast("bigint").alias("min_cid"),
            F.min_by("min_cid_chars", "min_cid")
            .cast("bigint")
            .alias("min_cid_chars"),
        )
    )


def maintain_crawl_report(
    spark: SparkSession, fetch_stream: DataFrame, state_path: str
):
    """Start a foreachBatch query folding each micro-batch of fetch
    rows (crawl_id, text, archive_id) into the crawl-report state.
    Returns the StreamingQuery (caller awaits termination)."""
    ckpt = state_path + "_ckpt"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        fold_batch(
            spark,
            state_path,
            batch_df,
            batch_id,
            _ckpt_query_id(ckpt),
            partial_fn=lambda b: _crawl_partials(spark, b),
            merge_fn=_crawl_merge,
        )

    return (
        fetch_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def read_crawl_report(spark: SparkSession, state_path: str) -> DataFrame:
    """The full bucket report derived from maintained state — the
    same 13-row schema as ``corpus_from_crawl`` (bucket, n_docs,
    total_chars, n_hosts, fp_hi_sum, fp_lo_sum), equal to the one-shot
    batch report by construction (shared oracle hash-checks it)."""
    from rag_lakehouse_spark.plans.crawl_queries import _shard_bucket

    state = read_state(spark, state_path)
    if state is None:
        raise FileNotFoundError(f"no crawl report state at {state_path}")
    state = state.drop("last_batch_id", "ckpt_id")
    gate = state.filter(F.col("kind") == "gate").select(
        F.concat(F.lit("drop:"), F.col("reason")).alias("bucket"),
        "host",
        "n",
        "chars_sum",
        "fp_hi_sum",
        "fp_lo_sum",
    )
    fph = state.filter(F.col("kind") == "fp")
    # the canonical copy of each fingerprint: smallest crawl_id across
    # hosts — a bounded window over state rows, never raw fetches
    wfp = W.partitionBy("fp")
    fph = fph.withColumn("canon_cid", F.min("min_cid").over(wfp))
    is_canon = F.col("min_cid") == F.col("canon_cid")
    canon = fph.filter(is_canon).select(
        _shard_bucket(F.col("min_cid")).alias("bucket"),
        "host",
        F.lit(1).cast("bigint").alias("n"),
        F.col("min_cid_chars").alias("chars_sum"),
        F.shiftright("fp", 30).cast("bigint").alias("fp_hi_sum"),
        F.col("fp").bitwiseAND(F.lit(_M30)).cast("bigint").alias("fp_lo_sum"),
    )
    n_dup = F.col("n") - F.when(is_canon, F.lit(1)).otherwise(F.lit(0))
    dup = (
        fph.withColumn("n_dup", n_dup)
        .filter(F.col("n_dup") > 0)
        .select(
            F.lit("drop:duplicate").alias("bucket"),
            "host",
            F.col("n_dup").alias("n"),
            (
                F.col("chars_sum")
                - F.when(is_canon, F.col("min_cid_chars")).otherwise(F.lit(0))
            ).alias("chars_sum"),
            (F.col("n_dup") * F.shiftright("fp", 30))
            .cast("bigint")
            .alias("fp_hi_sum"),
            (F.col("n_dup") * F.col("fp").bitwiseAND(F.lit(_M30)))
            .cast("bigint")
            .alias("fp_lo_sum"),
        )
    )
    return (
        gate.unionByName(canon)
        .unionByName(dup)
        .groupBy("bucket")
        .agg(
            F.sum("n").cast("bigint").alias("n_docs"),
            F.sum("chars_sum").cast("bigint").alias("total_chars"),
            F.count_distinct("host").cast("bigint").alias("n_hosts"),
            F.sum("fp_hi_sum").cast("bigint").alias("fp_hi_sum"),
            F.sum("fp_lo_sum").cast("bigint").alias("fp_lo_sum"),
        )
    )
