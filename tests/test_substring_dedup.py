"""Hand-built semantics checks for exact-substring (k-token window)
dedup (operators/substring_dedup.py): first occurrence owns, later
occurrences are stripped — across documents AND within one document —
and short documents pass through untouched. The registered queries'
cross-engine exactness is covered by the oracle harness; these lock
the operator-level contract on corpora small enough to verify by hand.
"""

from __future__ import annotations

import pytest

from rag_lakehouse_spark.operators.substring_dedup import (
    dup_span_stats,
    strip_duplicate_spans,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a b c d e f g h i j"),          # owner of the shared prefix
        (2, "a b c d e f tail one two"),     # shares 6-token prefix with 1
        (3, "unique content nothing shared here at all"),
        (4, "a b c d e f g h i j"),          # exact duplicate of 1
        (5, "x y z w x y z w"),              # internal repetition
        (6, "too short"),                    # < k tokens → no windows
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_strip_cross_doc_and_exact_dup(spark, docs):
    out = {
        r["doc_id"]: r
        for r in strip_duplicate_spans(docs, k=4).collect()
    }
    # Owner doc keeps everything.
    assert out[1]["n_removed"] == 0
    assert out[1]["text_clean"] == "a b c d e f g h i j"
    # Doc 2: windows at pos 1-3 duplicate doc 1's → tokens 1-6 covered.
    assert out[2]["n_removed"] == 6
    assert out[2]["text_clean"] == "tail one two"
    # Untouched doc.
    assert out[3]["n_removed"] == 0
    # Exact duplicate: every window owned by doc 1 → fully stripped.
    assert out[4]["n_removed"] == out[4]["n_tokens"] == 10
    assert out[4]["text_clean"] == ""
    # Short doc: no windows, untouched.
    assert out[6]["n_removed"] == 0
    assert out[6]["text_clean"] == "too short"


def test_strip_internal_repetition(spark, docs):
    out = {r["doc_id"]: r for r in strip_duplicate_spans(docs, k=4).collect()}
    # "x y z w x y z w": window pos 5 repeats pos 1 (same doc) →
    # positions 5-8 covered, first occurrence survives.
    assert out[5]["n_removed"] == 4
    assert out[5]["text_clean"] == "x y z w"


def test_stats_match_strip_decision(spark, docs):
    stats = {r["doc_id"]: r for r in dup_span_stats(docs, k=4).collect()}
    # Doc 1 owns every duplicated window it participates in → 0 dups.
    assert stats[1]["n_dup_windows"] == 0
    # Doc 4 is a full duplicate: all 7 windows (10 - 4 + 1) are non-owned.
    assert stats[4]["n_windows"] == 7
    assert stats[4]["n_dup_windows"] == 7
    assert stats[4]["dup_fraction"] == 1.0
    # Doc 2: 3 of its 6 windows duplicate doc 1's prefix windows.
    assert stats[2]["n_windows"] == 6
    assert stats[2]["n_dup_windows"] == 3
    # Short doc: zero windows, fraction defined as 0.
    assert stats[6]["n_windows"] == 0
    assert stats[6]["dup_fraction"] == 0.0
