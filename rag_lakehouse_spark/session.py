"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the same
config block is what we would ship to a 1000-executor cluster — only
``master`` and the memory knobs change. Key choices:

- AQE on (runtime coalescing, skew-join splitting, join-strategy
  switching) — at 100 TB the static plan is always wrong somewhere.
- ``spark.sql.ansi.enabled=false``: the silver contract of the
  reference pipeline (jobs/silver_transformation.py:77-82) relies on
  to-null cast semantics; Spark 4 defaults ANSI on, which would raise
  instead. Library code still prefers ``try_cast`` for clarity.
- Session timezone pinned UTC so timestamp semantics match the DuckDB
  oracle and are cluster-location independent.
- Shuffle partitions sized to cores locally; on a real cluster AQE
  coalesces from a deliberately high initial number.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "rag_lakehouse_spark", **extra_conf: str) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # InferFiltersFromGenerate clones the full generator expression
        # into a pre-explode filter; with expensive array builders
        # (shingling) that duplicates the whole computation — and lands
        # below the fan-out exchange, i.e. single-threaded on small
        # single-file inputs. Measured 22s -> 0.5s on the shingle path.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # Runtime bloom-filter semi-join reduction: when a selective
        # build side can't broadcast, inject a bloom filter of its join
        # keys into the probe-side scan. Default size thresholds kept —
        # locally it never fires (probe side must exceed ~10 GB); on the
        # 100 TB cluster it prunes shuffle input for free.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in extra_conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make ``rag_lakehouse_spark`` importable inside Python WORKERS
    regardless of the driver's working directory: zip the package once
    per process and ``addPyFile`` it. Pandas-UDF closures (embedding,
    multimodal) pickle module-level functions BY REFERENCE, so the
    worker must import the package — the driver's ``sys.path`` patch
    does not propagate to workers, and a driver launched outside the
    repo dir would otherwise fail with ModuleNotFoundError only on the
    UDF queries. On a real cluster this is exactly how the package
    ships (addPyFile / --py-files)."""
    sc = spark.sparkContext
    if getattr(sc, "_rls_pyfile_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"rag_lakehouse_spark_pyfiles_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        tmp = zpath + ".tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for root, _, files in os.walk(pkg_dir):
                for f in sorted(files):
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        z.write(full, rel)
        os.replace(tmp, zpath)
    sc.addPyFile(zpath)
    sc._rls_pyfile_shipped = True


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable engine confs to an externally created
    session (the driver harness builds its own SparkSession; static confs
    like driver memory cannot change here, but SQL semantics can)."""
    _ship_package(spark)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set(
        "spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
    )
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    except Exception:
        pass  # conf may be static in some deployments; semantics confs above are what matter
    return spark
