"""Plan-shaping utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, factor: int = 2) -> DataFrame:
    """Round-robin repartition to ~factor× total cores before CPU-heavy
    per-row work (shingling, hashing, vector scoring).

    Why: a small single-file table is one input split, so Spark runs
    the entire downstream compute in ONE task — the classic
    small-input/large-compute skew. The repartition shuffles only the
    raw source rows (cheap); at real scale inputs are already split and
    this is a no-op-priced rebalance. AQE cannot fix this case: it
    coalesces many partitions, it never splits one oversized compute
    partition."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism * factor)
