"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as the union + window trick, which scales: tag both sides,
union them, sort within each key partition by (time, side), and carry
the most recent right-side payload forward with
``last(..., ignorenulls=True)``. One shuffle on the join key, no
per-group Python, no range explosion — versus pandas ``merge_asof``
per group (Python, memory-bound) or a range-band equi-join
(duplicates + post-filter).

At 100 TB: partition count on the key shuffle is the only knob; skewed
keys (one hot user) fall back to AQE skew splitting — the window is
order-dependent per key, so splitting a key needs range partitioning
within it (documented limitation, same as any windowed op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_cols: tuple[str, ...] = (),
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the right row with the
    greatest ``right_ts <= left_ts`` within the same ``by`` key
    (backward as-of, inclusive). Right payload columns come back
    null-filled when no prior right row exists.

    ``tolerance_seconds`` optionally voids matches older than the
    given gap (merge_asof-style tolerance).
    """
    payload_cols = tuple(payload_cols) or tuple(
        c for c in right.columns if c not in (by, right_ts)
    )
    l_tagged = left.select(
        F.col(by).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in (right_ts, *payload_cols)]).alias("s"))
            .schema["s"]
            .dataType.simpleString()
        ).alias("__r"),
    )
    r_tagged = right.select(
        F.col(by).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType.simpleString()
        ).alias("__l"),
        F.struct(*[F.col(c) for c in (right_ts, *payload_cols)]).alias("__r"),
    )
    # right rows sort before left rows at equal timestamps → inclusive <=
    w = (
        W.partitionBy("__k")
        .orderBy("__t", "__is_left")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    unioned = l_tagged.unionByName(r_tagged)
    carried = unioned.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
    out = carried.filter(F.col("__is_left") == 1)
    if tolerance_seconds is not None:
        out = out.withColumn(
            "__match",
            F.when(
                F.unix_timestamp("__t")
                - F.unix_timestamp(F.col(f"__match.{right_ts}"))
                <= tolerance_seconds,
                F.col("__match"),
            ),
        )
    result_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    result_cols += [
        F.col(f"__match.{c}").alias(f"right_{c}") for c in (right_ts, *payload_cols)
    ]
    return out.select(*result_cols)
