"""Object-store seam and transactional-format seam tests.

The container has no hadoop-aws or Delta/Iceberg jars, so the
network-touching paths are gated (skipped-not-dead) while the
scheme-agnostic path handling and the configuration plumbing — the
parts the engine owns — are tested for real, including a full medallion
round-trip over a non-local URI scheme (``file://``)."""

from __future__ import annotations

import json

import pytest

from rag_lakehouse_spark.sources.lakehouse import (
    best_format,
    format_available,
    read_table,
    write_table,
)
from rag_lakehouse_spark.sources.storage import (
    configure_object_store,
    join_uri,
    object_store_conf,
    s3a_available,
)


def test_join_uri_scheme_agnostic():
    assert join_uri("/data/sf0.1", "events.parquet") == "/data/sf0.1/events.parquet"
    assert join_uri("/data/sf0.1/", "events.parquet") == "/data/sf0.1/events.parquet"
    assert join_uri("file:///tmp/zone/", "silver") == "file:///tmp/zone/silver"
    assert (
        join_uri("s3a://bucket/prefix", "bronze", "run_id=7")
        == "s3a://bucket/prefix/bronze/run_id=7"
    )


def test_load_table_via_file_uri(spark, sf_dir):
    """load_table accepts a URI-scheme sf_dir, not only a POSIX path."""
    from rag_lakehouse_spark.sources.tables import load_table

    plain = load_table(spark, sf_dir, "nation").count()
    via_uri = load_table(spark, f"file://{sf_dir}", "nation").count()
    assert plain == via_uri > 0


def test_medallion_roundtrip_on_file_uri(spark, tmp_path_factory):
    """Full raw→bronze→silver pipeline with every read and write going
    through a non-local URI scheme (file://) — proves no os.path
    assumption anywhere on the zone paths."""
    from rag_lakehouse_spark.sources.medallion import run_pipeline

    root = tmp_path_factory.mktemp("uri_medallion")
    raw = root / "raw"
    raw.mkdir()
    rec = {
        "title_xpath": "A Book",
        "price_xpath": "£51.77",
        "availability_xpaths": "In stock (22 available)",
        "book_url": "http://example.test/b/1",
        "scraped_at": "2026-02-01T10:00:00",
        "id": "b1",
    }
    (raw / "part-0.json").write_text("\n".join([json.dumps(rec)] * 3))
    silver = run_pipeline(
        spark, f"file://{raw}", f"file://{root}/zones", run_id="r7"
    )
    rows = silver.collect()
    assert len(rows) == 3
    assert rows[0].price == 51.77 and rows[0].quantity == 22


def test_object_store_conf_shape():
    conf = object_store_conf("http://minio.example.test:9000", "ak", "sk")
    assert conf["fs.s3a.endpoint"] == "http://minio.example.test:9000"
    assert conf["fs.s3a.path.style.access"] == "true"  # MinIO requirement
    assert conf["fs.s3a.access.key"] == "ak"
    assert conf["fs.s3a.committer.name"] == "magic"  # no-rename commit
    # without explicit creds the provider chain is left alone
    anon = object_store_conf("http://minio.example.test:9000")
    assert "fs.s3a.access.key" not in anon
    assert "fs.s3a.aws.credentials.provider" not in anon


def test_configure_object_store_applies_to_live_session(spark):
    configure_object_store(
        spark, "http://minio.example.test:9000", "ak", "sk", path_style=True
    )
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.endpoint") == "http://minio.example.test:9000"
    assert hconf.get("fs.s3a.path.style.access") == "true"
    assert hconf.get("fs.s3a.secret.key") == "sk"


def test_configure_object_store_requires_endpoint(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_S3_ENDPOINT", raising=False)
    with pytest.raises(ValueError, match="endpoint"):
        configure_object_store(spark)


def test_write_table_parquet_fallback_roundtrip(spark, tmp_path_factory):
    """best_format degrades to parquet without jars; write/read/overwrite
    through the seam must round-trip and honor partitioning."""
    out = str(tmp_path_factory.mktemp("lakehouse")) + "/t"
    df = spark.createDataFrame(
        [(i, i % 2) for i in range(10)], "id long, bucket int"
    )
    fmt = best_format(spark)
    write_table(df, out, fmt=fmt, partition_cols=("bucket",))
    assert read_table(spark, out).count() == 10
    # overwrite replaces, not appends
    write_table(df.limit(4), out, fmt=fmt, partition_cols=("bucket",))
    assert read_table(spark, out).count() == 4


def test_write_table_unavailable_format_fails_fast(spark, tmp_path_factory):
    missing = next(
        (f for f in ("delta", "iceberg") if not format_available(spark, f)), None
    )
    if missing is None:
        pytest.skip("all table formats available in this environment")
    out = str(tmp_path_factory.mktemp("lakehouse_missing")) + "/t"
    with pytest.raises(RuntimeError, match="classpath"):
        write_table(spark.range(3), out, fmt=missing)


def test_delta_atomic_overwrite_semantics(spark, tmp_path_factory):
    """With the Delta jar present: an overwrite must be a snapshot swap
    (old data readable until commit; no partial state). Skipped — not
    silently dead — where the jar is absent."""
    if not format_available(spark, "delta"):
        pytest.skip("delta-spark jar not on classpath in this container")
    out = str(tmp_path_factory.mktemp("delta")) + "/t"
    write_table(spark.range(100), out, fmt="delta")
    before = read_table(spark, out, fmt="delta")
    write_table(spark.range(5), out, fmt="delta")
    assert read_table(spark, out, fmt="delta").count() == 5
    # the pre-overwrite snapshot stayed consistent (time travel v0)
    v0 = spark.read.format("delta").option("versionAsOf", 0).load(out)
    assert v0.count() == 100


def test_s3a_gating(spark):
    """s3a availability probe matches reality; require_s3a explains the
    fix instead of a deep ClassNotFoundException."""
    from rag_lakehouse_spark.sources.storage import require_s3a

    if s3a_available(spark):
        require_s3a(spark)  # must not raise
    else:
        with pytest.raises(RuntimeError, match="hadoop-aws"):
            require_s3a(spark)
