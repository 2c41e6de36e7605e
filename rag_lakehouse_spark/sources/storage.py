"""Object-store I/O seam (s3a / MinIO / any S3-compatible endpoint).

The reference's entire storage layer is MinIO prefix-keyed objects
(reference helper/minio_manager.py:258-306, consumed from
jobs/bronze_transformation.py:37, jobs/silver_transformation.py:91 and
jobs/embedder.py:110 — list objects under a prefix, download, re-upload
part files by hand). Spark-first, that whole layer is the hadoop-aws
``s3a`` connector: the SAME ``spark.read.parquet`` / ``DataFrameWriter``
code paths, pointed at ``s3a://bucket/prefix`` URIs, with the
endpoint/credential configuration below. Nothing in this engine does
filesystem-specific work — every reader/writer takes a path-or-URI
string and lets the Hadoop FileSystem layer resolve the scheme, so
``/local/path``, ``file:///...`` and ``s3a://...`` are interchangeable
(see ``join_uri`` and the round-trip test on a ``file://`` URI).

Cluster deploys can pass the identical key/value pairs at submit time as
``--conf spark.hadoop.<key>=<value>``; ``configure_object_store`` applies
them to a live session's Hadoop configuration instead (the keys are
runtime-settable), which is what a notebook or the driver harness needs.

Scale notes: s3a has no atomic rename, so the default rename-based
commit is both slow and non-atomic on object stores — production writes
should enable the S3A "magic" committer (``fs.s3a.committer.name=magic``,
included below) or write through a table format (see
``sources.lakehouse`` for the Delta/Iceberg seam, which commits via
metadata swap instead of renames).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: FQCN of the s3a filesystem — present iff hadoop-aws is on the classpath.
_S3A_FS = "org.apache.hadoop.fs.s3a.S3AFileSystem"


def join_uri(base: str, *parts: str) -> str:
    """Scheme-agnostic path join: identical results for plain POSIX
    paths, ``file://`` URIs and ``s3a://`` URIs (object keys must not
    contain empty segments, so slashes are normalized)."""
    out = base.rstrip("/")
    for p in parts:
        out += "/" + str(p).strip("/")
    return out


def object_store_conf(
    endpoint: str,
    access_key: str | None = None,
    secret_key: str | None = None,
    *,
    path_style: bool = True,
    ssl: bool = False,
) -> dict[str, str]:
    """Hadoop configuration for an S3-compatible endpoint.

    ``path_style=True`` is what MinIO requires (bucket in the path, not
    the host); AWS-proper works with either. Credentials are passed via
    configuration — never hardcoded — and fall back to the provider
    chain (instance profiles, env) when not given.
    """
    conf = {
        "fs.s3a.endpoint": endpoint,
        "fs.s3a.path.style.access": str(path_style).lower(),
        "fs.s3a.connection.ssl.enabled": str(ssl).lower(),
        # Object stores have no atomic rename: task commit via the magic
        # committer writes directly to the final location with a
        # metadata-level completion, avoiding the O(data) copy-and-delete
        # of the rename committer.
        "fs.s3a.committer.name": "magic",
    }
    if access_key and secret_key:
        conf["fs.s3a.access.key"] = access_key
        conf["fs.s3a.secret.key"] = secret_key
        conf["fs.s3a.aws.credentials.provider"] = (
            "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider"
        )
    return conf


def configure_object_store(
    spark: SparkSession,
    endpoint: str | None = None,
    access_key: str | None = None,
    secret_key: str | None = None,
    *,
    path_style: bool = True,
    ssl: bool = False,
) -> SparkSession:
    """Apply s3a configuration to a live session. Arguments default to
    the conventional environment variables (``SPARK_GRAFT_S3_ENDPOINT``,
    ``AWS_ACCESS_KEY_ID``, ``AWS_SECRET_ACCESS_KEY``) so the same code
    works locally against MinIO and on a cluster with instance creds."""
    endpoint = endpoint or os.environ.get("SPARK_GRAFT_S3_ENDPOINT")
    access_key = access_key or os.environ.get("AWS_ACCESS_KEY_ID")
    secret_key = secret_key or os.environ.get("AWS_SECRET_ACCESS_KEY")
    if not endpoint:
        raise ValueError(
            "object-store endpoint required (arg or SPARK_GRAFT_S3_ENDPOINT)"
        )
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in object_store_conf(
        endpoint, access_key, secret_key, path_style=path_style, ssl=ssl
    ).items():
        hconf.set(k, v)
    return spark


def s3a_available(spark: SparkSession) -> bool:
    """True iff the hadoop-aws s3a filesystem is on the JVM classpath.
    The engine gates s3a-only tests and fails fast with a clear message
    instead of a deep ClassNotFoundException mid-job."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(_S3A_FS)
        return True
    except Exception:
        return False


def require_s3a(spark: SparkSession) -> None:
    if not s3a_available(spark):
        raise RuntimeError(
            "s3a scheme requested but hadoop-aws is not on the classpath; "
            "add the hadoop-aws + aws-sdk bundle jars (matching the Hadoop "
            "version) via spark.jars.packages or the cluster image"
        )
