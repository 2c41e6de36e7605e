"""Source/sink format coverage (SURVEY §2.1): CSV / JSON / ORC
round-trips preserve data exactly, and per-file lineage via
input_file_name (the engine's replacement for the reference's
object-listing discovery, minio_manager.list_objects)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_lakehouse_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _assert_same_rows(a, b, key="doc_id"):
    ra = {r[key]: tuple(r) for r in a.collect()}
    rb = {r[key]: tuple(r) for r in b.collect()}
    assert ra == rb


def test_csv_roundtrip(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("csv_sink"))
    docs.write.mode("overwrite").option("header", True).option("quoteAll", True).csv(out)
    back = (
        spark.read.option("header", True)
        .schema("doc_id long, text string, lang string, source string, n_chars long")
        .csv(out)
    )
    _assert_same_rows(docs, back)


def test_json_roundtrip(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("json_sink"))
    docs.write.mode("overwrite").json(out)
    back = spark.read.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).json(out)
    _assert_same_rows(docs, back)


def test_orc_roundtrip(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("orc_sink"))
    docs.write.mode("overwrite").orc(out)
    _assert_same_rows(docs, spark.read.orc(out))


def test_input_file_lineage(spark, docs, tmp_path_factory):
    """Per-file lineage: every row knows its source object — the
    DataFrame-native form of prefix-listing discovery."""
    out = str(tmp_path_factory.mktemp("multi_file"))
    docs.repartition(3).write.mode("overwrite").parquet(out)
    lineage = (
        spark.read.parquet(out)
        .select(F.regexp_extract(F.input_file_name(), r"[^/]+$", 0).alias("src_file"))
        .groupBy("src_file")
        .count()
    )
    rows = lineage.collect()
    assert len(rows) == 3
    assert sum(r["count"] for r in rows) == docs.count()
    assert all(r.src_file.endswith(".parquet") for r in rows)
