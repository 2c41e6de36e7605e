"""Slowly-changing-dimension (SCD2) merge and table maintenance,
without a transactional table format: the anti-join + union emulation
of MERGE INTO (the guide-level pattern for environments without
Delta/Iceberg jars; with them, this becomes a single MERGE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    tracked_cols: tuple[str, ...],
    effective_col: str = "effective_from",
    end_col: str = "effective_to",
    current_flag: str = "is_current",
    batch_ts: str = "2026-01-01 00:00:00",
) -> DataFrame:
    """Type-2 merge: rows whose tracked columns changed get their
    current version closed (end timestamp + flag) and a new open
    version appended; unchanged and absent keys pass through.

    current schema: key, *tracked_cols, effective_from, effective_to
    (null=open), is_current. updates schema: key, *tracked_cols.

    Scale: two shuffles on the key (change-detect join + union is
    map-side). History never rewrites more than the touched keys'
    current rows.
    """
    changed_cond = F.lit(False)
    for c in tracked_cols:
        changed_cond = changed_cond | ~F.col(f"cur.{c}").eqNullSafe(F.col(f"upd.{c}"))

    cur_open = current.filter(F.col(current_flag)).alias("cur")
    upd = updates.alias("upd")

    # keys whose tracked values actually changed (or are brand new)
    changed_keys = (
        cur_open.join(upd, F.col(f"cur.{key}") == F.col(f"upd.{key}"))
        .filter(changed_cond)
        .select(F.col(f"upd.{key}").alias(key))
    )
    # Anti-join against the OPEN versions only: a key whose versions are
    # all closed (no is_current row) must still get a new open version
    # when it reappears in updates — anti-joining the full table would
    # silently drop it (its closed history rows would mask it).
    new_keys = upd.join(cur_open, key, "left_anti").select(key)
    # four consumers below (two semis, one anti, one semi) — materialize
    # the tiny touched-key set once instead of re-running the
    # change-detect joins per consumer (docs/SCALE.md self-join rule)
    affected = changed_keys.union(new_keys).distinct().localCheckpoint(eager=True)

    # close the superseded current versions
    closed = (
        current.join(affected, key, "left_semi")
        .filter(F.col(current_flag))
        .withColumn(end_col, F.lit(batch_ts))
        .withColumn(current_flag, F.lit(False))
    )
    untouched = current.join(affected, key, "left_anti").unionByName(
        current.join(affected, key, "left_semi").filter(~F.col(current_flag))
    )

    # open the new versions
    opened = (
        updates.join(affected, key, "left_semi")
        .withColumn(effective_col, F.lit(batch_ts))
        .withColumn(end_col, F.lit(None).cast("string"))
        .withColumn(current_flag, F.lit(True))
    )
    return untouched.unionByName(closed).unionByName(opened)


def compact(spark, path: str, target_files: int = 8) -> None:
    """Small-file compaction: rewrite a parquet directory into
    ``target_files`` files. The maintenance job that keeps scan
    parallelism healthy after many incremental appends (file count ~
    task count; thousands of KB-files poison the scheduler)."""
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    import shutil

    shutil.rmtree(path)
    shutil.move(tmp, path)
