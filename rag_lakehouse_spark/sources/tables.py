"""Parquet table catalog over the driver's star schema + corpus tables.

The reference discovers datasets by recursive object-store prefix
listing (reference helper/minio_manager.py:258-306, used from
jobs/bronze_transformation.py:37); Spark's file-source reader does the
same listing internally from a path, with partition discovery, predicate
pushdown and column pruning for free — so a "table" here is just a
parquet path (TESTDATA.md layout).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from rag_lakehouse_spark.sources.storage import join_uri

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; read it as raw nanos and truncate to micros
        # (lossless here — the generator emits whole-microsecond values,
        # and DuckDB's reader performs the same us conversion).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(join_uri(sf_dir, "events.parquet"))
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            # Some parquet reader configs resolve TIMESTAMP(NANOS) as
            # TIMESTAMP_NTZ instead of raw nanos. The session timezone is
            # pinned to UTC (session.py:35), so NTZ -> LTZ is a lossless
            # relabel; downstream time functions (unix_micros, window,
            # session_window) all require TIMESTAMP.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    # join_uri keeps this scheme-agnostic: sf_dir may be a plain path,
    # file://, or s3a://bucket/prefix (with configure_object_store).
    return spark.read.parquet(join_uri(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL API) and return
    the DataFrames (for the DataFrame API). Idempotent."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
