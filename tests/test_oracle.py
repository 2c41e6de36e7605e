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


# Ledger guard (VERDICT r10 #7): the registry-count narrative in
# ROUND_NOTES/COVERAGE.md is load-bearing evidence — pin both counts to
# literals updated once per landed query so the ledger cannot silently
# drift inside a round (the r10 notes show a 210/211/212 drift).
REGISTRY_COUNT = 261  # r14 running count — update in the SAME commit as the query
ORACLED_COUNT = 244


def test_registry_count_matches_ledger():
    assert len(registry.QUERIES) == REGISTRY_COUNT
    assert len(ORACLED) == ORACLED_COUNT


def test_priority_names_all_registered():
    # ADVICE r10: a typo'd/renamed _PRIORITY name must fail loudly, not
    # silently drop out of the driver sample.
    assert set(registry._PRIORITY) <= set(registry.QUERIES)
    with pytest.raises(KeyError):
        registry._ordered({})


def test_entry_contract(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.oracle_sql()) <= set(mod.queries())


def test_round_notes_registry_counts_match_live():
    """r12 (VERDICT r11 #3 sibling): the evidence ledger's registry
    narrative must bind to the code — parse the FIRST
    'Registry: **N queries / M oracled**' line in ROUND_NOTES.md (the
    current round's snapshot) and assert it equals the live registry,
    so the r10-style count drift cannot recur inside a round."""
    import os
    import re

    path = os.path.join(os.path.dirname(__file__), "..", "ROUND_NOTES.md")
    with open(path, encoding="utf-8") as f:
        text = f.read()
    m = re.search(r"Registry: \*\*(\d+) queries / (\d+) oracled\*\*", text)
    assert m, "ROUND_NOTES.md is missing the registry snapshot line"
    assert (int(m.group(1)), int(m.group(2))) == (
        len(registry.QUERIES),
        len(ORACLED),
    ), "ROUND_NOTES.md registry counts drifted from the live registry"
