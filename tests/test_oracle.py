"""Differential correctness: every registered query with an oracle must
match DuckDB exactly (row count + columns + order-insensitive value
multiset) at sf0.001 — the same check the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from rag_lakehouse_spark.plans import registry
from tests.oracle_harness import compare

registry._load_all()
ORACLED = sorted(n for n, q in registry.QUERIES.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in registry.QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(name, spark, sf_dir, duck):
    q = registry.QUERIES[name]
    problems = compare(name, q.fn(spark, sf_dir), duck, q.oracle)
    assert not problems, problems


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(name, spark, sf_dir):
    df = registry.QUERIES[name].fn(spark, sf_dir)
    assert df.count() >= 0
    assert df.columns  # stable, non-empty schema


def test_entry_contract(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.oracle_sql()) <= set(mod.queries())
