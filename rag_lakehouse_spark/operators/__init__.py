from rag_lakehouse_spark.operators import (
    chunking,
    dedup,
    embedding,
    multimodal,
    similarity,
    text,
)

__all__ = ["chunking", "dedup", "embedding", "multimodal", "similarity", "text"]
