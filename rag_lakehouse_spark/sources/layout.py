"""Layout-aware writes: sort-clustered parquet for min/max data
skipping.

Partitioning prunes directories; WITHIN a partition, the parquet reader
can still skip whole row groups using column min/max statistics — but
only if the writer clustered values so the stats are selective. A table
sorted by its hot filter key turns point/range predicates into
row-group skips (the poor man's Z-order; for one key it is exactly
optimal, Z-order only wins for multi-key filters).

At 100 TB: repartitionByRange gives non-overlapping file ranges across
the cluster (each task writes a distinct key range), sortWithinPartitions
orders rows inside each file, and ``parquet.block.size`` controls skip
granularity. The effect is measured, not assumed — see
tests/test_layout.py, which asserts the scan reads fewer rows from the
sorted layout than from the shuffled one under the same pushed filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_sorted(
    df: DataFrame,
    path: str,
    sort_col: str,
    n_files: int = 8,
    row_group_mb: int = 1,
) -> str:
    """Range-partition by ``sort_col`` into ``n_files`` non-overlapping
    files, sorted within each, with small row groups so min/max skipping
    has granularity. Returns the path."""
    (
        df.repartitionByRange(n_files, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .option("parquet.block.size", row_group_mb * 1024 * 1024)
        .parquet(path)
    )
    return path


def zorder_key(col_a, col_b, bits: int = 16):
    """Z-order (Morton) interleaving of two non-negative integer
    columns as a pure codegen expression: bit i of each input lands at
    output bits 2i / 2i+1. Sorting by this key clusters the data along
    BOTH dimensions at once, so min/max row-group stats stay selective
    for predicates on EITHER column — the multi-key generalization of
    single-column sort-clustering (Delta OPTIMIZE ZORDER-style, minus
    the table format).

    ``bits`` caps the per-column range at 2^bits (callers quantize
    bigger domains down first — rank or bucket ids, not raw keys).
    """
    from pyspark.sql import functions as F

    a = col_a if not isinstance(col_a, str) else F.col(col_a)
    b = col_b if not isinstance(col_b, str) else F.col(col_b)
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = (
            out
            + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    row_group_kb: int = 1024,
    bits: int = 8,
    quantize: bool = True,
) -> str:
    """Cluster by the Z-order interleave of two integer columns:
    range-partition + sort on the Morton key, small row groups.
    Returns the path.

    ``quantize`` (default) first scales each column onto the same
    2^bits range — WITHOUT it, the wider-range column's high bits
    dominate the interleave and the layout degenerates toward a
    single-column sort (measured: suppkey predicates skipped nothing
    against raw 9-bit partkey vs 7-bit suppkey interleave; with
    quantization they read 3× fewer rows). See tests/test_layout.py
    for the measured both-dimension skipping.

    Quantization is min-shifted: values map to ``(v - min) * 2^bits /
    (max - min + 1)``, so negative domains land in [0, 2^bits) like any
    other. (Max-only scaling left negatives negative, and shiftright on
    negative longs sign-extends — the interleave silently degraded.)
    An EMPTY input writes an empty parquet table as-is: there is
    nothing to quantize, and ``int(None)`` used to crash here."""
    from pyspark.sql import functions as F

    a, b = F.col(col_a), F.col(col_b)
    if quantize:
        mna, mxa, mnb, mxb = df.agg(
            F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
        ).collect()[0]
        if mxa is None or mxb is None:  # empty input (or all-null keys)
            df.write.mode("overwrite").option(
                "parquet.block.size", row_group_kb * 1024
            ).parquet(path)
            return path
        span_a, span_b = int(mxa) - int(mna) + 1, int(mxb) - int(mnb) + 1
        a = ((a - F.lit(int(mna))) * (1 << bits) / span_a).cast("long")
        b = ((b - F.lit(int(mnb))) * (1 << bits) / span_b).cast("long")
    keyed = df.withColumn("__z", zorder_key(a, b, bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .option("parquet.block.size", row_group_kb * 1024)
        .parquet(path)
    )
    return path


def shard_plan(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: int = 1337,
) -> DataFrame:
    """Seed-reproducible training-export order: each row gets a shard
    and a dense within-shard position from a portable 60-bit hash of
    ``"shard:<seed>:<id>"``. Same (data, seed) → identical plan on any
    engine, any partitioning, any rerun — the property a training run
    needs to resume mid-epoch or re-derive exactly which examples a
    checkpoint saw. Changing the seed reshuffles globally.

    Scale: the hash is codegen map work; the position is one
    row_number per shard — a single shuffle hash-partitioned on shard,
    each shard sorting independently (pick n_shards ≥ cluster
    parallelism; hash output is uniform so shards balance)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from rag_lakehouse_spark.operators.dedup_portable import base60

    h = base60(
        F.concat(F.lit(f"shard:{seed}:"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy("shard").orderBy("h", id_col)
    return (
        df.withColumn("h", h)
        .withColumn("shard", F.col("h") % F.lit(n_shards))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("h")
    )


def write_sharded(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: int = 1337,
) -> str:
    """Materialize the shard plan as shard-partitioned parquet, rows
    ordered by ``pos`` within each shard file. Byte-reproducible for a
    fixed (data, seed): re-running the export writes identical rows in
    identical order, so training-data provenance is a (snapshot, seed)
    pair, not a copy."""
    planned = shard_plan(df, id_col=id_col, n_shards=n_shards, seed=seed)
    (
        planned.repartition("shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    return path
