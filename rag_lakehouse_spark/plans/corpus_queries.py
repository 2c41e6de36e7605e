"""Training-corpus governance queries: benchmark decontamination, PII
redaction, and the composed C4-style cleaning pipeline. These are the
operational day-2 queries of an LLM data pipeline, built from the
engine's text primitives (functions.text) so the DuckDB oracles reuse
the same fuzz-verified twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rag_lakehouse_spark.functions import text as TX
from rag_lakehouse_spark.plans.registry import register
from rag_lakehouse_spark.sources.tables import load_table

_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"


@register(
    "corpus_decontaminate",
    oracle=f"""
    WITH bench AS (
      SELECT DISTINCT unnest({TX.duckdb_char_shingles('text', 13)}) AS sh
      FROM documents WHERE doc_id < 10
    ), doc_sh AS (
      SELECT doc_id, unnest({TX.duckdb_char_shingles('text', 13)}) AS sh
      FROM documents WHERE doc_id >= 10
    )
    SELECT doc_id, CAST(COUNT(DISTINCT doc_sh.sh) AS BIGINT) AS n_shared
    FROM doc_sh JOIN bench USING (sh)
    GROUP BY doc_id
    """,
    tags=("text", "decontamination", "training-data"),
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (the standard 13-gram collision
    check): docs sharing any normalized 13-gram with the benchmark set
    (here: doc_id < 10 stands in for an eval suite), with the shared
    count per doc.

    Scale: the benchmark's distinct shingle set is tiny by construction
    (eval suites, not corpora) → broadcast hash join against the
    corpus-side shingle explode; the only shuffle is the per-doc count.
    The corpus text itself never shuffles."""
    d = load_table(spark, sf_dir, "documents")
    bench = (
        TX.shingle_relation(d.filter(F.col("doc_id") < 10), "text", "doc_id", 13)
        .select(F.explode("shingles").alias("sh"))
        .distinct()
    )
    corpus = TX.shingle_relation(
        d.filter(F.col("doc_id") >= 10), "text", "doc_id", 13
    ).select("doc_id", F.explode("shingles").alias("sh"))
    return (
        corpus.join(F.broadcast(bench), "sh")
        .groupBy("doc_id")
        .agg(F.countDistinct("sh").alias("n_shared"))
    )


@register(
    "text_pii_redact",
    oracle=f"""
    WITH synth AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@example.com or +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.' AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PHONE}')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(t, '{_EMAIL}', '[EMAIL]', 'g'),
                              '{_PHONE}', '[PHONE]', 'g')) AS redacted_md5
    FROM synth
    """,
    tags=("text", "pii", "training-data"),
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: email/phone detection counts + the md5 of the
    redacted text. The synthetic corpus carries no PII, so each doc
    deterministically synthesizes one email + one phone from its id
    (identically in both engines) — the regexes then have real matches
    to find and strip, and the md5 proves the redacted BYTES agree
    cross-engine, not just the counts.

    Scale: pure codegen map work (regexp per row), no shuffle — 100 TB
    is embarrassingly parallel; patterns chosen to parse identically
    in Java regex and RE2."""
    d = load_table(spark, sf_dir, "documents")
    synth = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit("."),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(synth, _EMAIL, "[EMAIL]"), _PHONE, "[PHONE]"
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(synth, F.lit(_EMAIL), 0)).cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all(synth, F.lit(_PHONE), 0)).cast("bigint").alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


@register(
    "corpus_clean_pipeline",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, source, text,
             length(text) AS n,
             length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS np,
             length(regexp_replace(text, '[^0-9]', '', 'g')) AS nd
      FROM documents WHERE lang = 'en'
    ), quality AS (
      SELECT * FROM feats
      WHERE n BETWEEN 100 AND 20000
        AND CAST(np AS DOUBLE) / n < 0.1
        AND CAST(nd AS DOUBLE) / n < 0.3
    ), canon AS (
      SELECT {TX.duckdb_fingerprint('text')} AS fp, MIN(doc_id) AS keep
      FROM quality GROUP BY 1
    ), deduped AS (
      SELECT q.* FROM quality q
      JOIN canon ON {TX.duckdb_fingerprint('q.text')} = fp AND q.doc_id = keep
    ), sampled AS (
      SELECT * FROM deduped WHERE substring(md5(text), 1, 2) < '80'
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS n_chars,
           CAST(SUM(np) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS punct_per_char
    FROM sampled GROUP BY source
    """,
    tags=("text", "pipeline", "training-data"),
)
def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed C4-style cleaning pipeline in ONE plan: language
    filter → quality gate (length band + punct/digit density) → exact
    dedup (md5-of-normalized fingerprint, min-id canonical) → 50%
    deterministic content-hash sample → per-source corpus stats. Each
    stage is an already-oracled primitive; this query proves they
    COMPOSE without a materialization between stages.

    Scale: filters and ratios evaluate at the scan; the only shuffles
    are the fingerprint aggregate (32-byte keys) and the final tiny
    per-source stats. The mean punct density is exact (integer sums
    divided once), not an order-dependent average of doubles."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    n = F.length("text")
    np_ = F.length(F.regexp_replace("text", "[^.,!?;:]", ""))
    nd = F.length(F.regexp_replace("text", "[^0-9]", ""))
    feats = d.select(
        "doc_id", "source", "text", n.alias("n"), np_.alias("np"), nd.alias("nd")
    )
    quality = feats.filter(
        F.col("n").between(100, 20000)
        & (F.col("np").cast("double") / F.col("n") < 0.1)
        & (F.col("nd").cast("double") / F.col("n") < 0.3)
    )
    canon = (
        quality.select(TX.fingerprint("text").alias("c_fp"), "doc_id")
        .groupBy("c_fp")
        .agg(F.min("doc_id").alias("keep"))
    )
    deduped = quality.withColumn("fp", TX.fingerprint("text")).join(
        canon,
        (F.col("fp") == F.col("c_fp")) & (F.col("doc_id") == F.col("keep")),
        "left_semi",
    )
    sampled = deduped.filter(F.substring(F.md5("text"), 1, 2) < "80")
    return sampled.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n").cast("bigint").alias("n_chars"),
        (F.sum("np").cast("double") / F.sum("n").cast("double")).alias("punct_per_char"),
    )
