from rag_lakehouse_spark.plans.registry import QUERIES, Query, oracle_sql, queries, register

__all__ = ["QUERIES", "Query", "register", "queries", "oracle_sql"]
