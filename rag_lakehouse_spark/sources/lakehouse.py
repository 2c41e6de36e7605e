"""Transactional table-format seam (Delta Lake / Apache Iceberg),
gated on jar availability, with a plain-parquet fallback.

Reference gap this fills (SURVEY §1.3): the reference commits a zone by
staging parquet locally and re-uploading part files one by one
(reference jobs/bronze_transformation.py:73-80) — a hand-rolled,
non-atomic commit; a reader listing the prefix mid-upload sees a
partial dataset. With a transactional format the overwrite is a
metadata swap: readers see the old snapshot or the new one, never a
mix, and concurrent writers conflict-detect instead of corrupting.

The seam is deliberately thin: ``write_table``/``read_table`` accept a
format name or pick the best available one at runtime. In this
container no Delta/Iceberg jars ship, so ``best_format`` degrades to
``parquet`` and every caller keeps working; on a cluster image with
``delta-spark`` (plus ``spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension``
and the catalog conf at session build) or the Iceberg runtime, the same
call sites get atomic semantics with no code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Data-source classes whose presence proves the format jar is loaded.
_FORMAT_PROBE = {
    "delta": "org.apache.spark.sql.delta.sources.DeltaDataSource",
    "iceberg": "org.apache.iceberg.spark.source.IcebergSource",
}


def format_available(spark: SparkSession, fmt: str) -> bool:
    """True iff the given table format's data source is on the JVM
    classpath (``parquet`` is always available)."""
    if fmt == "parquet":
        return True
    probe = _FORMAT_PROBE.get(fmt)
    if probe is None:
        return False
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(probe)
        return True
    except Exception:
        return False


def best_format(spark: SparkSession) -> str:
    """The most capable table format available: delta > iceberg >
    parquet. Delta first because its path-addressed tables need no
    catalog configuration for read/write/overwrite."""
    for fmt in ("delta", "iceberg"):
        if format_available(spark, fmt):
            return fmt
    return "parquet"


def write_table(
    df: DataFrame,
    path: str,
    fmt: str | None = None,
    mode: str = "overwrite",
    partition_cols: tuple[str, ...] = (),
) -> str:
    """Write a path-addressed table in the requested (or best available)
    format. ``overwrite`` is atomic for delta/iceberg (snapshot swap);
    for parquet it is delete-then-write — the documented fallback."""
    spark = df.sparkSession
    fmt = fmt or best_format(spark)
    if not format_available(spark, fmt):
        raise RuntimeError(
            f"table format {fmt!r} requested but its jar is not on the "
            f"classpath; install it or use fmt='parquet'"
        )
    writer = df.write.format(fmt).mode(mode)
    cols = [c for c in partition_cols if c in df.columns]
    if cols:
        writer = writer.partitionBy(*cols)
    writer.save(path)
    return path


def read_table(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    """Read a path-addressed table; format auto-detected when not given:
    a ``_delta_log`` dir means Delta, an Iceberg ``metadata`` dir (with
    ``*.metadata.json`` version files) means Iceberg, else plain parquet.

    The Iceberg probe matters: reading an Iceberg table root as raw
    parquet would scan data files ACROSS snapshots (Iceberg keeps
    superseded files on disk until expiry) — stale and uncommitted rows
    included. Detect-or-fail-loud, never silently misread.
    """
    if fmt is None:
        if _has_delta_log(spark, path):
            fmt = "delta"
        elif _has_iceberg_metadata(spark, path):
            fmt = "iceberg"
        else:
            fmt = "parquet"
    return spark.read.format(fmt).load(path)


def _has_delta_log(spark: SparkSession, path: str) -> bool:
    if not format_available(spark, "delta"):
        return False
    try:
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(path + "/_delta_log")
        return p.getFileSystem(hconf).exists(p)
    except Exception:
        return False


def _has_iceberg_metadata(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` looks like an Iceberg (HadoopTables) table root:
    a ``metadata/`` dir containing ``*.metadata.json`` version files."""
    if not format_available(spark, "iceberg"):
        return False
    try:
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        meta = jvm.org.apache.hadoop.fs.Path(path + "/metadata")
        fs = meta.getFileSystem(hconf)
        if not fs.exists(meta):
            return False
        glob = jvm.org.apache.hadoop.fs.Path(path + "/metadata/*.metadata.json")
        return len(fs.globStatus(glob) or []) > 0
    except Exception:
        return False
