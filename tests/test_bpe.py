"""Differential tests for the distributed BPE trainer: the Spark
iteration must produce the IDENTICAL merge table (ranks, pairs,
counts) as the pure-Python reference trainer, on fixture corpora and
on hypothesis-generated ones (repeated tokens, unicode, ties)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rag_lakehouse_spark.operators.bpe import (
    train_merges,
    train_merges_reference,
    word_counts,
)
from rag_lakehouse_spark.sources.tables import load_table


def _spark_rules(spark, docs_df, n):
    wc = word_counts(docs_df)
    ref = train_merges_reference(
        {r["word"]: r["freq"] for r in wc.collect()}, n
    )
    got = train_merges(wc, n)
    return got, ref


def test_bpe_matches_reference_on_fixture(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    got, ref = _spark_rules(spark, d, 12)
    assert got == ref
    assert len(got) == 12  # the fixture vocabulary supports ≥12 merges
    ranks = [r[0] for r in got]
    assert ranks == list(range(12))
    # counts are non-increasing only per-round argmax, but every rule
    # must have met the min_count bar
    assert all(c >= 2 for _, _, _, c in got)


_word = st.one_of(
    st.sampled_from(["aa", "aaa", "ab", "abab", "the", "thee", "ба", "日本"]),
    st.text(
        alphabet=st.characters(min_codepoint=97, max_codepoint=122), min_size=1, max_size=5
    ),
)
_docs = st.lists(
    st.lists(_word, min_size=0, max_size=8).map(" ".join), min_size=1, max_size=5
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(docs=_docs)
def test_bpe_matches_reference_on_generated_corpus(spark, docs):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got, ref = _spark_rules(spark, df, 6)
    assert got == ref


def test_bpe_encode_matches_reference_on_fixture(spark, sf_dir):
    from collections import Counter
    import re

    from rag_lakehouse_spark.operators.bpe import (
        bpe_token_counts,
        encode_word_reference,
    )
    from rag_lakehouse_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    wc = word_counts(d)
    rules = train_merges(wc, 12)
    got = {
        r.doc_id: (r.n_words, r.n_word_chars, r.n_bpe_tokens)
        for r in bpe_token_counts(d, rules).collect()
    }

    # Python twin: the same explicit-class edge-trim + split tokenizer,
    # the reference encoder per distinct word.
    cls = r"[ \t\n\x0B\f\r]+"
    enc_cache: dict[str, int] = {}
    want = {}
    for row in d.select("doc_id", "text").collect():
        text = row.text or ""
        text = re.sub(f"^{cls}|{cls}$", "", text)
        words = [w for w in re.split(cls, text) if w != ""]
        for w in set(words) - set(enc_cache):
            enc_cache[w] = len(encode_word_reference(w, rules))
        want[row.doc_id] = (
            len(words),
            sum(len(w) for w in words),
            sum(enc_cache[w] for w in words),
        )
    assert got == want
    # merges really compress: BPE tokens < characters on the fixture
    tot_toks = sum(v[2] for v in got.values())
    tot_chars = sum(v[1] for v in got.values())
    assert 0 < tot_toks < tot_chars


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(docs=_docs)
def test_bpe_encode_matches_reference_on_generated_corpus(spark, docs):
    from rag_lakehouse_spark.operators.bpe import (
        bpe_token_counts,
        encode_word_reference,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    rules = train_merges(word_counts(df), 6)
    got = {r.doc_id: r.n_bpe_tokens for r in bpe_token_counts(df, rules).collect()}
    for i, t in enumerate(docs):
        words = [w for w in t.split(" ") if w]
        assert got[i] == sum(len(encode_word_reference(w, rules)) for w in words), (
            i, t, rules,
        )
