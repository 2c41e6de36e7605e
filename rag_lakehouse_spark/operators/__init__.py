from rag_lakehouse_spark.operators import chunking, dedup, similarity, text

__all__ = ["chunking", "dedup", "similarity", "text"]
