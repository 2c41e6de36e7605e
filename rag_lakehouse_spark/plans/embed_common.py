"""Shared portable chunk→embed scaffolding for the oracled
embed-pipeline twins (``embed_and_search_portable``,
``rag_eval_retrieval``): fixed-200 chunking in the proven
``chunk_fixed_docs`` dialect, the md5-hex quarter embedder
(``VEC.md5_embed``), and the first-5-documents query set — ONE
definition each for the Spark plan and the DuckDB CTE text, so a
change to the chunk size, id scheme, or embedder dimension cannot
silently diverge the twins (r10 review finding)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rag_lakehouse_spark.functions import vector as VEC
from rag_lakehouse_spark.sources.tables import load_table

#: WITH-clause body defining d / chunks / emb / q — compose as
#: f"WITH {CHUNK_EMB_CTES}, ..." in an oracle string.
CHUNK_EMB_CTES = f"""d AS (
      SELECT doc_id, coalesce(text, '') AS text FROM documents
    ), chunks AS (
      SELECT doc_id,
             'doc_' || doc_id || '_chunk_' ||
               unnest(generate_series(0, (greatest(length(text),1)-1)//200))
               AS chunk_id,
             unnest(list_transform(
                 generate_series(0, (greatest(length(text),1)-1)//200),
                 i -> substring(text, i*200+1, 200)))
               AS chunk_text
      FROM d
    ), emb AS (
      SELECT doc_id, chunk_id,
             {VEC.duckdb_md5_embed("chunk_text")} AS embedding
      FROM chunks
    ), q AS (
      SELECT doc_id AS query_id,
             {VEC.duckdb_md5_embed("substring(text, 1, 120)")} AS q_emb
      FROM d WHERE doc_id < 5
    )"""


def chunked_embeddings(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(chunks, emb, queries) — the Spark twin of ``CHUNK_EMB_CTES``:
    chunks carries (doc_id, chunk_number, chunk_id, chunk_text), emb
    carries (doc_id, chunk_id, embedding), queries carries
    (query_id, q_emb) for doc_id < 5."""
    from rag_lakehouse_spark.operators.chunking import chunk_fixed

    d = load_table(spark, sf_dir, "documents").withColumn(
        "text", F.coalesce("text", F.lit(""))
    )
    chunks = chunk_fixed(d, text_col="text", id_col="doc_id", size=200, id_prefix="doc")
    emb = chunks.select(
        "doc_id", "chunk_id", VEC.md5_embed("chunk_text").alias("embedding")
    )
    qs = d.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"),
        VEC.md5_embed(F.substring("text", 1, 120)).alias("q_emb"),
    )
    return chunks, emb, qs
