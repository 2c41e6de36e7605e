"""rag_lakehouse_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first reimplementation of the query and
data-processing capabilities of the reference RAG-lakehouse pipeline
(medallion zones, typed silver contract, chunk/embed/retrieve vector
operators), generalized into a large-scale LLM-data-pipeline engine:
relational core, text analysis, exact/approximate dedup, similarity
search/join, and an event-stream surface.

Design stance (SURVEY.md §7.0): DataFrame-native, Catalyst is the
optimizer, Parquet is the storage, Arrow-vectorized pandas UDFs are the
only escape hatch. No ``collect()`` in any operator path.
"""

from rag_lakehouse_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
