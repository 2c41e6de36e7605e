"""RAG serve-path parity: passage assembly, retrieval attribution with
the refusal guard — the reference's /ask endpoint semantics
(reference src/api.py:19-80) minus the external LLM call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rag_lakehouse_spark.functions import vector as VEC
from rag_lakehouse_spark.plans.registry import register
from rag_lakehouse_spark.sources.tables import load_table

REFUSAL = "I do not have enough information to answer this question."


@register(
    "passage_assembly",
    oracle="""
    SELECT p_partkey,
           'Name: ' || p_name || '. Brand: ' || p_brand || '. Type: ' || p_type
             AS passage,
           concat_ws('_', 'part', CAST(p_partkey AS VARCHAR), 'doc') AS passage_id,
           length('Name: ' || p_name || '. Brand: ' || p_brand || '. Type: ' || p_type)
             AS passage_len
    FROM part WHERE p_partkey < 300
    """,
    tags=("rag", "string"),
)
def passage_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-passage synthesis from structured fields — the
    reference's '"Title: {t}. Category: {c}. Description: {d}"' doc
    assembly (jobs/embedder.py:63) and 'book_{id}_chunk_{i}' id scheme
    (jobs/embedder.py:83), on the part dimension."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    passage = F.concat(
        F.lit("Name: "), F.col("p_name"),
        F.lit(". Brand: "), F.col("p_brand"),
        F.lit(". Type: "), F.col("p_type"),
    )
    return p.select(
        "p_partkey",
        passage.alias("passage"),
        F.concat_ws("_", F.lit("part"), F.col("p_partkey").cast("string"), F.lit("doc")).alias(
            "passage_id"
        ),
        F.length(passage).alias("passage_len"),
    )


@register(
    "rag_attribution_guard",
    oracle=f"""
    WITH scored AS (
      SELECT b.vec_id,
             {VEC.duckdb_cosine('a.embedding', 'b.embedding')} AS score
      FROM embeddings a, embeddings b
      WHERE a.vec_id = 0 AND b.vec_id <> 0
    ),
    ranked AS (
      SELECT vec_id, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, vec_id) AS rank
      FROM scored
    ),
    topk AS (
      SELECT r.rank, r.score, d.source
      FROM ranked r JOIN documents d ON d.doc_id = r.vec_id
      WHERE r.rank <= 3 AND r.score >= 0.2
    )
    SELECT 0 AS query_id,
           COUNT(*) AS n_docs,
           CASE WHEN COUNT(*) = 0
                THEN '{REFUSAL}'
                ELSE 'context_available' END AS answer_state,
           COALESCE(arg_min(source, rank), 'No source found') AS attribution
    FROM topk
    """,
    tags=("rag", "guard"),
)
def rag_attribution_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval attribution + empty-context guard: top-1 source unless
    nothing retrieves above threshold, then the refusal sentinel and
    'No source found' — reference src/api.py:49-51 (guard) and :78
    (attribution suppression)."""
    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    # score-threshold filter commutes with top-k on the same sort key,
    # so it runs BEFORE orderBy().limit(3) → TakeOrderedAndProject (no
    # single-partition rank window).
    topk3 = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", VEC.cosine("embedding", "q_emb").alias("score"))
        .filter(F.col("score") >= 0.2)
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(3)
    )
    topk = topk3.join(d, topk3.vec_id == d.doc_id)
    order_key = F.struct((-F.col("score")).alias("neg"), F.col("vec_id").alias("tie"))
    return topk.agg(
        F.lit(0).alias("query_id"),
        F.count(F.lit(1)).alias("n_docs"),
        F.when(F.count(F.lit(1)) == 0, REFUSAL)
        .otherwise("context_available")
        .alias("answer_state"),
        F.coalesce(F.min_by("source", order_key), F.lit("No source found")).alias(
            "attribution"
        ),
    )
