"""Property tests for the probabilistic dedup operators (SURVEY.md §5.2
golden/property strategy: exact duplicates must be found, jaccard of a
doc with itself is 1, signatures are deterministic)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_lakehouse_spark.operators.dedup import (
    minhash_lsh_pairs,
    minhash_signature,
    simhash_docs,
    simhash_near_pairs,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    near = base.replace("tonight", "today")  # one-token edit → near-dup
    other = "completely different content about spark dataframes and shuffle partitioning at scale"
    rows = [
        (1, base),
        (2, base),          # exact duplicate of 1
        (3, near),          # near duplicate of 1
        (4, other),
        (5, other + " with an extra tail of tokens appended here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_signature_deterministic_and_sized(docs):
    a = minhash_signature(docs, num_hashes=32).select("doc_id", "signature").collect()
    b = minhash_signature(docs, num_hashes=32).select("doc_id", "signature").collect()
    assert {r.doc_id: r.signature for r in a} == {r.doc_id: r.signature for r in b}
    assert all(len(r.signature) == 32 for r in a)
    sig = {r.doc_id: r.signature for r in a}
    assert sig[1] == sig[2]  # identical text → identical signature
    assert sig[1] != sig[4]


def test_minhash_lsh_finds_exact_and_near_pairs(docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(docs, threshold=0.3).collect()
    }
    assert pairs[(1, 2)] == pytest.approx(1.0)  # exact dup → jaccard 1
    assert (1, 3) in pairs and pairs[(1, 3)] > 0.5  # near dup found
    assert (1, 4) not in pairs  # unrelated not paired


def test_simhash_identity_and_distance(docs):
    sh = {r.doc_id: r.simhash for r in simhash_docs(docs).collect()}
    assert sh[1] == sh[2]
    ham_near = bin((sh[1] ^ sh[3]) & (2**64 - 1)).count("1")
    ham_far = bin((sh[1] ^ sh[4]) & (2**64 - 1)).count("1")
    assert ham_near < ham_far


def test_simhash_near_pairs(docs):
    pairs = {(r.id_a, r.id_b) for r in simhash_near_pairs(docs, max_hamming=8).collect()}
    assert (1, 2) in pairs
    assert (1, 4) not in pairs


def test_char_shingles_short_text_cross_engine(spark):
    """Texts shorter than k yield an EMPTY shingle set in both engines.
    Regression: Spark's sequence(1, 0) used to infer step -1 and emit a
    bogus whole-text shingle where DuckDB's generate_series(1, 0) is
    empty — a latent oracle divergence for every shingle-based query."""
    import duckdb

    from rag_lakehouse_spark.functions import text as TX

    rows = [(1, "short"), (2, "exactly8"), (3, "longer than eight chars"), (4, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: sorted(r.sh)
        for r in TX.with_shingles(df, "text", k=8, out="sh").select("doc_id", "sh").collect()
    }
    assert got[1] == [] and got[4] == []  # sub-k → empty, not [whole text]
    assert got[2] == ["exactly8"]

    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    duck = {
        i: sorted(s)
        for i, s in con.execute(
            f"SELECT doc_id, {TX.duckdb_char_shingles('text', 8)} FROM t"
        ).fetchall()
    }
    assert got == duck


def test_minhash_drops_sub_k_docs(spark):
    """Docs whose normalized text is shorter than shingle_k must get NO
    signature (and therefore never reach LSH banding). Regression:
    sequence(1, greatest(n_pos, 0)) fed sequence(1, 0) → [1, 0] for
    sub-k docs, so every short/empty doc got a truncated-substring
    signature and all empty docs collided pairwise in banding."""
    from rag_lakehouse_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signatures_only,
    )

    rows = [
        (1, "abc"),          # shorter than k
        (2, ""),             # empty
        (3, "?!  ..."),      # normalizes to empty
        (4, "a sufficiently long document that clears the shingle size"),
        (5, "another sufficiently long document clearing the shingle size"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r.doc_id for r in minhash_signatures_only(df, shingle_k=8).collect()}
    assert sigs == {4, 5}
    # short docs never reach banding → no pairs among ids 1-3
    pairs = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(df, threshold=0.1).collect()}
    assert all(a not in (1, 2, 3) and b not in (1, 2, 3) for a, b in pairs)


def test_exact_dedup_keeps_min_id(spark):
    from rag_lakehouse_spark.operators.text import exact_dedup

    df = spark.createDataFrame(
        [(10, "Same   Text!"), (3, "same text"), (7, "unique content")],
        "doc_id long, text string",
    )
    kept = sorted(r.doc_id for r in exact_dedup(df).collect())
    # normalization folds case/punct/whitespace → 10 and 3 collide, 3 wins
    assert kept == [3, 7]


# ---------------------------------------------------------------------------
# Portable-hash twins (operators.dedup_portable): same behavioral
# contracts as the xxhash64 family, plus cross-engine recall sanity.
# The bit-exact DuckDB equivalence is covered per-query by
# tests/test_oracle.py; these lock the dedup SEMANTICS.
# ---------------------------------------------------------------------------


def test_portable_minhash_finds_exact_and_near_pairs(docs):
    from rag_lakehouse_spark.operators.dedup_portable import portable_minhash_pairs

    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in portable_minhash_pairs(docs, threshold=0.3).collect()
    }
    assert pairs[(1, 2)] == pytest.approx(1.0)
    assert (1, 3) in pairs and pairs[(1, 3)] > 0.5
    assert (1, 4) not in pairs


def test_portable_minhash_recall_on_high_jaccard_corpus(spark, sf_dir):
    """Every corpus pair the exact n-gram Jaccard query scores >= 0.9
    must be caught by the portable MinHash-LSH banding (miss prob at
    J=0.9 is (1-0.9^3)^8 ~ 3e-5 per pair; seeds are fixed, so this is
    deterministic, not flaky)."""
    from rag_lakehouse_spark.plans.text_queries import dedup_ngram_jaccard
    from rag_lakehouse_spark.plans.pipeline_queries import dedup_minhash_portable

    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard(spark, sf_dir).filter("jaccard >= 0.9").collect()
    }
    found = {
        (r.id_a, r.id_b) for r in dedup_minhash_portable(spark, sf_dir).collect()
    }
    assert exact <= found


def test_portable_simhash_identity_and_distance(docs):
    from rag_lakehouse_spark.operators.dedup_portable import (
        SIMHASH_BITS,
        portable_simhash,
    )

    rows = portable_simhash(docs).collect()
    sh = {r.doc_id: r.simhash for r in rows}
    assert all(0 <= v < 2**SIMHASH_BITS for v in sh.values())
    assert sh[1] == sh[2]
    ham_near = bin(sh[1] ^ sh[3]).count("1")
    ham_far = bin(sh[1] ^ sh[4]).count("1")
    assert ham_near < ham_far
    n_tok = {r.doc_id: r.n_tokens for r in rows}
    assert n_tok[1] == 17


def test_portable_simhash_pairs_finds_identical_docs(docs):
    from rag_lakehouse_spark.operators.dedup_portable import portable_simhash_pairs

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in portable_simhash_pairs(docs, max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0  # identical text → hamming 0
    assert (1, 4) not in pairs  # unrelated content blocked out
