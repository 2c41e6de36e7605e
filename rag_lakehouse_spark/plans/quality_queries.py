"""Data-quality audit queries — the constraint-check layer every
training-data / lakehouse pipeline runs before promoting a zone
(null rates, domain violations, key uniqueness, referential orphans).

The reference enforces its silver contract implicitly (cast-to-null +
fillna, reference jobs/silver_transformation.py:63-82) but never
REPORTS violations; these queries make the checks first-class, exact,
and cheap: every check is an aggregate over one scan (plus one
broadcast anti-join for referential integrity), so auditing 100 TB
costs one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rag_lakehouse_spark.plans.registry import register
from rag_lakehouse_spark.sources.tables import load_table


@register(
    "dq_orders_report",
    oracle="""
    WITH base AS (
      SELECT 'null_orderdate' AS check_name,
             COUNT(*) FILTER (WHERE o_orderdate IS NULL) AS n_bad,
             COUNT(*) AS n_rows
      FROM orders
      UNION ALL
      SELECT 'nonpositive_price',
             COUNT(*) FILTER (WHERE o_totalprice <= 0), COUNT(*)
      FROM orders
      UNION ALL
      SELECT 'invalid_status',
             COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P')),
             COUNT(*)
      FROM orders
      UNION ALL
      SELECT 'duplicate_orderkey',
             COUNT(*) - COUNT(DISTINCT o_orderkey), COUNT(*)
      FROM orders
      UNION ALL
      SELECT 'orphan_custkey',
             COUNT(*) FILTER (WHERE c_custkey IS NULL), COUNT(*)
      FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    )
    SELECT check_name, n_bad, n_rows,
           CAST(n_bad AS DOUBLE) / n_rows AS violation_rate
    FROM base
    """,
    tags=("quality", "audit", "agg"),
)
def dq_orders_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit over orders: null rate, value domain, status
    domain, key uniqueness, and customer referential integrity — one
    row per check with exact violation counts.

    Scale: the four column checks ride ONE scan (conditional
    aggregates); the orphan check is a broadcast left join against the
    customer keys. No check needs more than an aggregate's shuffle.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")

    def check(name: str, n_bad, src: DataFrame) -> DataFrame:
        return src.agg(
            F.lit(name).alias("check_name"),
            n_bad.cast("bigint").alias("n_bad"),
            F.count(F.lit(1)).alias("n_rows"),
        )

    checks = [
        check("null_orderdate", F.count(F.when(F.col("o_orderdate").isNull(), 1)), o),
        check("nonpositive_price", F.count(F.when(F.col("o_totalprice") <= 0, 1)), o),
        check(
            "invalid_status",
            F.count(F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)),
            o,
        ),
        check(
            "duplicate_orderkey",
            F.count(F.lit(1)) - F.countDistinct("o_orderkey"),
            o,
        ),
        check(
            "orphan_custkey",
            F.count(F.when(F.col("c_custkey").isNull(), 1)),
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left"),
        ),
    ]
    out = checks[0]
    for df in checks[1:]:
        out = out.unionByName(df)
    return out.select(
        "check_name",
        "n_bad",
        "n_rows",
        (F.col("n_bad").cast("double") / F.col("n_rows")).alias("violation_rate"),
    )


@register(
    "dq_documents_report",
    oracle="""
    WITH base AS (
      SELECT 'empty_text' AS check_name,
             COUNT(*) FILTER (WHERE text IS NULL OR length(trim(text)) = 0) AS n_bad,
             COUNT(*) AS n_rows
      FROM documents
      UNION ALL
      SELECT 'bad_char_count',
             COUNT(*) FILTER (WHERE n_chars <> length(text)), COUNT(*)
      FROM documents
      UNION ALL
      SELECT 'unknown_lang',
             COUNT(*) FILTER (WHERE lang NOT IN ('en', 'de', 'fr', 'es', 'zh')),
             COUNT(*)
      FROM documents
      UNION ALL
      SELECT 'duplicate_doc_id',
             COUNT(*) - COUNT(DISTINCT doc_id), COUNT(*)
      FROM documents
    )
    SELECT check_name, n_bad, n_rows,
           CAST(n_bad AS DOUBLE) / n_rows AS violation_rate
    FROM base
    """,
    tags=("quality", "audit", "text"),
)
def dq_documents_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-side quality audit: empty documents, metadata/content
    drift (n_chars vs actual length), language-tag domain, id
    uniqueness — the gate a training corpus passes before tokenization
    spend. One scan, conditional aggregates."""
    d = load_table(spark, sf_dir, "documents")

    def check(name: str, n_bad) -> DataFrame:
        return d.agg(
            F.lit(name).alias("check_name"),
            n_bad.cast("bigint").alias("n_bad"),
            F.count(F.lit(1)).alias("n_rows"),
        )

    empty = F.col("text").isNull() | (F.length(F.trim(F.col("text"))) == 0)
    checks = [
        check("empty_text", F.count(F.when(empty, 1))),
        check("bad_char_count", F.count(F.when(F.col("n_chars") != F.length("text"), 1))),
        check(
            "unknown_lang",
            F.count(F.when(~F.col("lang").isin("en", "de", "fr", "es", "zh"), 1)),
        ),
        check("duplicate_doc_id", F.count(F.lit(1)) - F.countDistinct("doc_id")),
    ]
    out = checks[0]
    for df in checks[1:]:
        out = out.unionByName(df)
    return out.select(
        "check_name",
        "n_bad",
        "n_rows",
        (F.col("n_bad").cast("double") / F.col("n_rows")).alias("violation_rate"),
    )
