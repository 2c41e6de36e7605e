"""Join strategy utilities beyond Catalyst's defaults: bucketed
co-located joins (shuffle elimination for repeated big-big joins) and
salted joins (hot-key skew mitigation when AQE's runtime splitting
isn't available or isn't enough).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) managed table.

    Scale rationale: two fact tables bucketed on the same join key with
    the same bucket count join WITHOUT an exchange — the dominant cost
    of repeated big-big joins disappears. This is the Spark analogue of
    co-partitioned storage; at 100 TB, bucket the canonical join keys
    (orderkey, doc fingerprint, user_id) at write time once.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — planned
    shuffle-free (SortMergeJoin over pre-bucketed scans).
    tests/test_bucketing.py asserts no Exchange appears in the plan."""
    return spark.table(left_table).join(spark.table(right_table), on)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with hot-key salting: the (skewed) left side gets a
    random salt in [0, salt); the (smaller/broadcastable-ish but too
    big to broadcast) right side is replicated salt×. The shuffle key
    becomes (key, salt), spreading a hot key over `salt` reducers.

    Use when one key holds a disproportionate share of rows and AQE
    skew-join (which only splits sort-merge partitions) doesn't apply —
    e.g. aggregate-after-join pipelines with a hot entity. Cost:
    right side inflates salt×; keep salt minimal."""
    salted_left = left.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    exploded_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_left.join(exploded_right, [on, "__salt"], how)
    return out.drop("__salt")
