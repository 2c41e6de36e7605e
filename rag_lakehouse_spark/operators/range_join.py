"""Bucketed range join — the scale path for point-in-interval joins.

Spark has no native range-join strategy: ``L.t BETWEEN R.lo AND R.hi``
with no equality key plans as BroadcastNestedLoopJoin (fine only while
one side broadcasts) or a cartesian product. The classic fix (what
engines with a range-join hint do under the hood) is to quantize the
range dimension into fixed-width buckets: points map to ONE bucket,
intervals explode to the (few) buckets they overlap, and the join
becomes a hash equi-join on bucket id with the exact range predicate
left as a residual filter.

Cost model: with bucket_width ~ the typical interval length, each
interval lands in ~2 buckets, so the exploded right side is ~2× its
input and the shuffle is hash-partitioned on bucket — no broadcast, no
nested loop, linear in data size. At 100 TB this is the only shape
that works: both sides shuffle by bucket, hot buckets (bursty time
ranges) split further via AQE skew handling. Pick bucket_width near
the median interval width; too small explodes the interval side, too
large degrades the equi-join's selectivity toward the nested loop.

An equality key (user_id, tenant) composes for free: it rides the
join keys next to the bucket id, sharpening the hash partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    extra_keys: tuple[str, ...] = (),
    end_inclusive: bool = False,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point < end`` (``<= end`` when ``end_inclusive``),
    optionally also matching on ``extra_keys`` equality columns present
    on both sides.

    ``point_col`` / ``start_col`` / ``end_col`` must be numeric
    (cast timestamps to epoch seconds first — see
    ``epoch_seconds``). Output carries all columns of both inputs
    (names must not collide apart from ``extra_keys``, which are kept
    from the point side).
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    p = points.withColumn(
        "__p_bucket", F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    )
    i = intervals.withColumn(
        "__i_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(end_col) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    for k in extra_keys:
        i = i.withColumnRenamed(k, f"__i_{k}")
    upper: Column = (
        F.col(point_col) <= F.col(end_col)
        if end_inclusive
        else F.col(point_col) < F.col(end_col)
    )
    cond = (
        (F.col("__p_bucket") == F.col("__i_bucket"))
        & (F.col(point_col) >= F.col(start_col))
        & upper
    )
    for k in extra_keys:
        cond = cond & (F.col(k) == F.col(f"__i_{k}"))
    out = p.join(i, cond, how).drop("__p_bucket", "__i_bucket")
    for k in extra_keys:
        out = out.drop(f"__i_{k}")
    return out


def epoch_micros(c: Column) -> Column:
    """Timestamp → exact epoch microseconds (long): the numeric axis
    for time-range joins. Integer micros keep bucket arithmetic exact;
    unix_timestamp() would truncate to whole seconds and shift
    sub-second points across interval boundaries. Bucket widths are
    then given in micros (e.g. one day = 86_400 * 1_000_000).

    Total over both timestamp flavors: unix_micros requires TIMESTAMP,
    so a TIMESTAMP_NTZ input is first relabeled via cast (a no-op for
    TIMESTAMP; for NTZ it applies the session timezone, pinned UTC)."""
    return F.unix_micros(c.cast("timestamp"))


def bucketed_interval_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width: float,
) -> DataFrame:
    """Interval-OVERLAP join (both sides are intervals; half-open
    [start, end)): pairs where ``l_start < r_end AND r_start < l_end``.
    Both sides explode to their covered buckets and hash-join on bucket
    id; the duplicate a pair would produce in every shared bucket is
    avoided WITHOUT a distinct shuffle by keeping the pair only in the
    bucket containing ``greatest(l_start, r_start)`` — the canonical
    first bucket of the overlap (the standard dedup-free overlap-join
    trick).

    Cost: with bucket_width near the typical interval length each side
    explodes ~2×; the join is a bucket-id hash equi-join — linear, no
    nested loop, AQE-splittable. Column names must not collide."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")

    def bucketed(df: DataFrame, s: str, e: str, out: str) -> DataFrame:
        return df.withColumn(
            out,
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / F.lit(bucket_width)).cast("long"),
                    F.floor(F.col(e) / F.lit(bucket_width)).cast("long"),
                )
            ),
        )

    l = bucketed(left, l_start, l_end, "__lb")
    r = bucketed(right, r_start, r_end, "__rb")
    overlap_start = F.greatest(F.col(l_start), F.col(r_start))
    cond = (
        (F.col("__lb") == F.col("__rb"))
        & (F.col(l_start) < F.col(r_end))
        & (F.col(r_start) < F.col(l_end))
        # dedup-free: emit only in the overlap's first bucket
        & (F.floor(overlap_start / F.lit(bucket_width)).cast("long") == F.col("__lb"))
    )
    return l.join(r, cond).drop("__lb", "__rb")
