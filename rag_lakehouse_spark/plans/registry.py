"""Named-query registry: the engine's public query surface.

Every operator family from SURVEY.md §2 is exposed as a named query:
a ``(spark, sf_dir) -> DataFrame`` callable plus (when SQL-expressible)
an equivalent ANSI-SQL oracle string that DuckDB runs on the same
parquet for differential correctness checking (row count + schema +
order-insensitive value hash).

Cross-engine exactness rules used throughout the registered queries:

- Money/ratio aggregates go through ``DECIMAL`` before ``SUM`` so the
  result is order-independent and bit-exact, then cast to ``DOUBLE``
  (double summation order differs between engines and between Spark
  partitionings; decimal arithmetic is exact).
- Averages are expressed as ``CAST(decimal_sum AS DOUBLE) / count`` —
  one deterministic double division instead of engine-specific
  decimal-division scale rules.
- Timestamps/dates in outputs are formatted to strings (engines differ
  in sub-second parquet physical-type handling: ns vs us).
- Every computed column is aliased identically on both sides.
- Window orderings always carry a unique tiebreaker column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or "")
        return fn

    return deco


def _load_all() -> None:
    # Import side-effect modules that register queries.
    import rag_lakehouse_spark.plans.relational  # noqa: F401
    import rag_lakehouse_spark.plans.events_queries  # noqa: F401
    import rag_lakehouse_spark.plans.text_queries  # noqa: F401
    import rag_lakehouse_spark.plans.vector_queries  # noqa: F401
    import rag_lakehouse_spark.plans.pipeline_queries  # noqa: F401
    import rag_lakehouse_spark.plans.advanced_queries  # noqa: F401
    import rag_lakehouse_spark.plans.rag_queries  # noqa: F401
    import rag_lakehouse_spark.plans.scalar_queries  # noqa: F401
    import rag_lakehouse_spark.plans.window_queries  # noqa: F401
    import rag_lakehouse_spark.plans.tpch_more  # noqa: F401
    import rag_lakehouse_spark.plans.quality_queries  # noqa: F401


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
