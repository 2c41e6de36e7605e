"""The full reference DAG, Spark-first: raw JSON → bronze → silver →
chunk → embed → vector index → retrieval answer context.

Replaces the reference's Airflow pipeline (dags/books_scraping_dag.py:
37-73: scrape >> bronze >> silver >> embed, then the Flask /ask read
path src/api.py) with one plain-function pipeline over DataFrames:

- no driver ``collect()`` between stages (the reference collects the
  whole silver table to embed it, jobs/embedder.py:54);
- no local-disk staging + manual part upload (bronze/silver
  transformations write partitioned parquet directly);
- embedding runs executor-side as an Arrow pandas UDF;
- the "vector store" is an embeddings parquet table; retrieval is a
  broadcast-scored top-k plan (operators.similarity).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rag_lakehouse_spark.operators.chunking import chunk_fixed
from rag_lakehouse_spark.operators.embedding import pseudo_embed_udf
from rag_lakehouse_spark.operators.similarity import knn_exact
from rag_lakehouse_spark.sources.medallion import (
    bronze_transform,
    read_raw_json,
    silver_transform,
    write_zone,
)

SEPARATOR = "\n\n---\n\n"


def build_index(
    spark: SparkSession,
    raw_path: str,
    base_path: str,
    run_id: str,
    chunk_size: int = 200,
    embed_udf=None,
) -> DataFrame:
    """Ingest + index: raw → bronze → silver → chunk records with
    denormalized parent metadata (reference jobs/embedder.py:61-87) →
    embedded chunks written as the vector table. Returns the index
    DataFrame (read back from the written zone)."""
    embed = embed_udf or pseudo_embed_udf()

    bronze = bronze_transform(read_raw_json(spark, raw_path))
    write_zone(bronze.withColumn("run_id", F.lit(run_id)), base_path, "bronze", ("run_id",))

    silver = silver_transform(bronze, run_id)
    write_zone(silver, base_path, "silver")

    passage = F.concat(
        F.lit("Title: "), F.coalesce(F.col("title"), F.lit("")),
        F.lit(". Category: "), F.coalesce(F.col("category"), F.lit("")),
        F.lit(". Description: "), F.coalesce(F.col("description"), F.lit("")),
    )
    docs = silver.select(
        "id", "title", "book_url", "category", "price", "run_id", "run_date",
        passage.alias("passage"),
    )
    chunks = (
        chunk_fixed(
            docs.withColumnRenamed("id", "book_id"),
            text_col="passage",
            id_col="book_id",
            size=chunk_size,
            id_prefix="book",
        )
        .join(docs.withColumnRenamed("id", "book_id"), "book_id")
        .select(
            "chunk_id",
            "book_id",
            "chunk_number",
            "chunk_text",
            "title",
            "book_url",
            "category",
            "price",
            "run_id",
            "run_date",
        )
    )
    indexed = chunks.withColumn("embedding", embed(F.col("chunk_text")))
    write_zone(indexed, base_path, "index")
    return spark.read.parquet(os.path.join(base_path, "index"))


def incremental_embed(
    existing_index: DataFrame,
    chunks: DataFrame,
    embed_udf=None,
    id_col: str = "chunk_id",
    text_col: str = "chunk_text",
) -> DataFrame:
    """Incremental index refresh: embed ONLY chunks that are new or
    whose text changed; reuse stored vectors for unchanged chunks; drop
    index rows whose chunk disappeared.

    Change detection is a content fingerprint (md5 of the chunk text)
    equi-joined on (chunk_id, fingerprint) — no timestamps to trust, no
    full re-embed. At 100 TB this is THE difference between an index
    refresh costing the changed slice (embedding is the expensive
    stage: model inference) and costing the whole corpus. The reference
    re-embeds everything every run (reference jobs/embedder.py:54-87).

    ``chunks`` must carry every non-embedding column of the index
    schema; returns the refreshed index (same schema as
    ``existing_index``).
    """
    embed = embed_udf or pseudo_embed_udf()
    fp = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    cand = chunks.withColumn("__fp", fp)
    existing = existing_index.withColumn("__fp", fp)

    # unchanged: same id + same content fingerprint → keep stored vector
    keep_keys = cand.select(id_col, "__fp")
    reused = existing.join(keep_keys, [id_col, "__fp"], "left_semi").drop("__fp")
    # new or changed content → embed just these
    to_embed = cand.join(
        existing.select(id_col, "__fp"), [id_col, "__fp"], "left_anti"
    ).drop("__fp")
    embedded = to_embed.withColumn("embedding", embed(F.col(text_col)))
    return reused.unionByName(embedded)


def ask(
    spark: SparkSession,
    index: DataFrame,
    questions: list[str],
    k: int = 3,
    embed_udf=None,
) -> DataFrame:
    """Retrieval read path (reference src/api.py:19-80, minus the LLM
    call): embed questions → top-k chunks → context assembly with the
    reference separator → top-1 source attribution with the
    no-context guard."""
    embed = embed_udf or pseudo_embed_udf()
    q = (
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(questions)], "query_id long, question string"
        )
        .withColumn("q_emb", embed(F.col("question")))
    )
    corpus = index.withColumn("chunk_key", F.xxhash64("chunk_id"))
    hits = knn_exact(corpus, q, k=k, corpus_id="chunk_key", corpus_vec="embedding")
    enriched = hits.join(corpus, hits.neighbor_id == corpus.chunk_key)
    assembled = enriched.groupBy("query_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rank", "chunk_text"))),
                lambda x: x["chunk_text"],
            ),
            SEPARATOR,
        ).alias("context"),
        F.min_by("book_url", "rank").alias("source"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return (
        q.join(assembled, "query_id", "left")
        .select(
            "query_id",
            "question",
            F.coalesce("context", F.lit("")).alias("context"),
            F.when(F.col("n_docs").isNull() | (F.col("n_docs") == 0), "No source found")
            .otherwise(F.col("source"))
            .alias("source"),
        )
    )
