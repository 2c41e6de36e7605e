"""End-to-end hypothesis fuzz for the newest oracled text queries
(`text_repetition_stats`, `corpus_pack_sequences`): generate a small
documents table — biased toward repeated lines/tokens, empty and
whitespace-only docs, unicode — write it as parquet, and demand the
registered Spark plan and its DuckDB oracle agree exactly. Fixture
corpora never contain the nasty shapes (the sub-k shingle lesson);
generated ones do.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rag_lakehouse_spark.plans import registry
from tests.oracle_harness import compare

registry._load_all()

_WORDS = ["aa", "bb", "cc", "aa aa", "x", "日本", "ü", "vector", "merge stream"]
_line = st.one_of(
    st.sampled_from(["", "  ", "aa bb", "aa aa aa", "bb cc aa bb cc"]),
    st.lists(st.sampled_from(_WORDS), max_size=5).map(" ".join),
    st.text(max_size=20).filter(lambda s: "\x00" not in s),
)
_doc = st.one_of(
    st.none(),
    st.lists(_line, max_size=6).map("\n".join),
)
_docs = st.lists(_doc, min_size=1, max_size=6)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _run(spark, tmp_path, docs, query_name):
    rows = [
        (i, t, "en", f"src{i % 2}", len(t) if t else 0)
        for i, t in enumerate(docs)
    ]
    return _run_rows(spark, tmp_path, rows, query_name)


def _run_rows(spark, tmp_path, rows, query_name):
    sf_dir = str(tmp_path)
    # load_table reads {sf_dir}/documents.parquet — a directory of that
    # name works for Spark's reader; DuckDB globs inside it
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "documents.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    q = registry.QUERIES[query_name]
    return compare(query_name, q.fn(spark, sf_dir), con, q.oracle)


@settings(**_SETTINGS)
@given(docs=_docs)
@pytest.mark.parametrize(
    "name",
    [
        "text_repetition_stats",
        "corpus_pack_sequences",
        "text_quality_score",
        "text_bpe_token_count",
        "dedup_exact_docs",
        "sample_stratified_docs",
        "text_fingerprint",
        "dedup_ngram_jaccard",
        "text_token_stats",
        "text_lang_id",
        "chunk_fixed_docs",
        "dedup_simhash_portable",
        # r7-tail additions: BM25 (query terms seeded into _WORDS so tf/idf
        # paths actually fire) and span-level dedup (repeated lines create
        # real duplicated windows once docs reach k=15 tokens)
        "rag_bm25_topk",
        "corpus_dup_span_stats",
        "corpus_strip_dup_spans",
        "corpus_dsir_select",
        "corpus_mixture_plan",
        # r7-tail: shared sampled lines ("aa bb") across generated docs
        # fire the cross-doc boilerplate rule for real (the fixture
        # corpus is single-line so the driver row only sees exact-dup
        # strips); shard export fuzzes the portable-hash order
        "corpus_boilerplate_strip",
        "corpus_shard_export",
        "text_unigram_surprisal",
        "corpus_perplexity_buckets",
        "corpus_heavy_tokens",
        # end-to-end manifest: generated docs mostly fail the length
        # gate, so this exercises the empty/near-empty composition path
        "corpus_export_manifest",
        # split leakage: generated duplicate texts land in different
        # hash splits, producing real non-zero leak counts
        "corpus_split_leakage",
        "corpus_vocab_stats",
        # edit-distance verify: duplicated generated docs create real
        # hamming-0 candidates; unicode docs exercise the ASCII
        # normalization contract that makes levenshtein portable
        "dedup_edit_verified",
        # RM3: tiny generated corpora make feedback docs & expansion
        # terms degenerate (ties everywhere) — the integer selection
        # and term-sorted fold must still agree
        "rag_rm3_expansion",
        # triangles: duplicated generated docs form real dup cliques
        "graph_triangle_counts",
        # weighted WOR sample: zero-length generated docs exercise the
        # weight floor; the 9-decimal ln rounding must agree
        "corpus_weighted_sample",
        # per-source gate: tied mean_bits across generated dup docs
        # exercise the unique-doc_id rank tiebreaker
        "quality_gate_per_source",
        # r8 additions. bigram surprisal: repeated-token docs create
        # real repeated transitions; single-token and empty docs hit
        # the n<2 guard on both engines
        "text_bigram_surprisal",
        # the stacked ensemble composes the repetition/surprisal/
        # charclass twins — any divergence in a component surfaces here
        # even if its own fuzz row is green (join/NULL seams)
        "corpus_quality_ensemble",
        # tf-idf: tied scores everywhere in tiny corpora — the
        # (score DESC, term ASC) tiebreak must agree exactly
        "text_tfidf_keywords",
        # KS drift: two sources with duplicate/empty docs; 1-source
        # corpora must yield empty results on BOTH engines
        "dq_source_drift_ks",
        # cross-source overlap: duplicated texts across src0/src1
        # produce real shared fingerprints
        "corpus_source_overlap",
        # sliding chunker: unicode + empty docs through the stride
        # window arithmetic
        "chunk_sliding_docs",
        # per-source cross-entropy: duplicated tokens across src0/src1
        # give the sources genuinely different bit costs
        "corpus_source_divergence",
        # PSI: tiny two-source tables make most decile bins empty on
        # one side (the zero-term convention) and tie every edge
        "dq_source_psi",
        # Pearson r: constant-length/constant-surprisal generated
        # sources hit the zero-variance NULL guard; single-doc sources
        "corpus_quality_correlation",
        # readability: no-sentence/no-word/unicode docs hit the
        # sentence floor and the n_words=0 NULL grade on both engines
        "text_readability_scores",
        # r9 frozen-vocab BPE encode: unicode/whitespace-only/NULL
        # docs stress the char seeding (codepoint indexing parity) and
        # the empty-doc left-join path; repeated-letter runs stress
        # leftmost non-overlapping pair merging in the list folds
        "corpus_bpe_encode_portable",
        # r10: the portable embed->search pipeline (md5-hex quarter
        # embedder over generated unicode/NULL/empty chunks — duplicate
        # texts force exact cosine ties on the (score, chunk_id)
        # tiebreak) and the media twins (byte features + codec
        # round-trip; single-doc corpora empty the knn side on BOTH
        # engines)
        "embed_and_search_portable",
        "media_features_portable",
        "media_metadata_report",
        # retrieval-eval metrics: tiny corpora give empty top-10 hits
        # (rr/recall/ndcg coalesce to 0.0), duplicate texts force
        # rank ties, and n_rel < 10 exercises the ideal-prefix index
        "rag_eval_retrieval",
        # merge-coverage: 'the'/'in'/'an'-bearing generated words hit
        # the frozen cascade; unicode/whitespace-only/NULL docs hit the
        # empty-source LEFT-JOIN path on both engines
        "corpus_vocab_coverage",
        # r11 lexical retrieval eval: tiny corpora make most docs BE
        # queries (doc_id < 5), term selection degenerates to full-tie
        # lexicographic picks, empty/NULL docs yield empty term sets
        # (their queries must still emit a metrics row via the source
        # join), and duplicate texts force tied BM25 ranks — the
        # streaming twin shares this pipeline + oracle, so this row
        # fuzzes both
        "rag_eval_bm25",
        # r11 token budget: NULL/whitespace-only docs exercise the
        # zero-token/zero-sequence guard (utilization 0e0 on both
        # engines); unicode tokenization parity via TX.WS
        "corpus_token_budget_report",
        # r11 feature hashing: unicode/duplicate tokens stress the
        # portable-hash bucket/sign parity; sign cancellation produces
        # legitimate zero-sum buckets both engines must keep
        "text_hashed_features",
        # r12 linear quality classifier: NULL/empty docs exercise the
        # token-less LEFT-join zero-score row; sign cancellation and
        # the int64 weight-formula products must agree exactly
        "text_quality_classifier",
        # r11 count-min: tiny corpora make MANY tokens heavy (cnt*200
        # >= n trivially), so collisions inside 512-wide rows — and the
        # >= 0 overcount contract — get exercised at real density
        "corpus_countmin_portable",
        # r11 Kneser-Ney: duplicate docs create real discount mass;
        # single-token/empty docs hit the n<2 guard; tiny bigram
        # vocabularies make Pcont coarse (B=1 -> p=1, log2=0 edge)
        "corpus_kn_bigram_scores",
        # r11 novelty curve: duplicated generated docs make later
        # copies 0-novelty; sub-8-char and NULL docs shingle to empty
        # (LEFT-JOIN zero path); 1-doc corpora put everything in
        # decile 0 with rate 1.0
        "corpus_novelty_curve",
        # r11 dedup ROI: duplicated texts across src0/src1 charge the
        # later source; all-unique corpora give 0 savings; empty/NULL
        # docs share one fingerprint with 0 tokens
        "corpus_dedup_savings",
    ],
)
def test_text_query_matches_oracle_on_generated_corpus(
    spark, tmp_path, name, docs
):
    problems = _run(spark, tmp_path, docs, name)
    assert not problems, problems


# VERDICT r10 #6: the media formulas (plans/media_queries.py closed
# doc_id -> (kind, dims, rates, sample counts) maps) were fuzzed only
# via the dense 0..N generated-corpus ids above. Hypothesis-chosen id
# SETS stress every residue class the formulas branch on — wav-kind
# presence/absence (ids with no doc_id%4==3 must yield EMPTY audio
# results on both engines), ns extremes (id 199 -> ns=149, ch=2), and
# 2^40-scale ids whose products must stay exact in int64 on both
# engines.
_media_ids = st.lists(
    st.one_of(
        st.integers(min_value=0, max_value=2**40),
        st.sampled_from([0, 1, 3, 7, 151, 199, 2**40 + 3]),
    ),
    min_size=1,
    max_size=8,
    unique=True,
)


@settings(**_SETTINGS)
@given(ids=_media_ids)
@pytest.mark.parametrize(
    "name",
    [
        "media_metadata_report",
        "media_audio_features",
        "media_audio_frames",
        # r11 pixel decode: ids with no doc_id%4==1 must yield EMPTY
        # image results on both engines; 2^40-scale ids exercise the
        # int64 formula products inside the % 256
        "media_image_pixels",
        # r11 frame walk: ids with no doc_id%4==2 must yield EMPTY
        # frame inventories; 2^40-scale ids exercise the int64 delay/
        # geometry formulas and the cumulative-delay fold
        "media_gif_frames",
        # r11 pixel decode: the LZW round trip at fuzzed ids/dims —
        # a single mis-decoded code would shift every later pixel and
        # break the weighted sums
        "media_gif_pixels",
        # r12 PNG pixel decode: the inflate+unfilter round trip at
        # fuzzed ids/dims (heights ≥ 8 cycle all five filters); 2^40
        # ids exercise the int64 formula products
        "media_png_pixels",
        # r12 JPEG marker walk: fuzzed ids vary stuffing density
        # (entropy bytes (id*7+5k)%256 include 0xFF runs), the
        # Exif/progressive/ncomp branches, and empty jpeg-kind sets
        "media_jpeg_metadata",
    ],
)
def test_media_query_matches_oracle_at_generated_params(
    spark, tmp_path, name, ids
):
    rows = [(i, f"t{i}", "en", f"src{i % 2}", 2) for i in ids]
    problems = _run_rows(spark, tmp_path, rows, name)
    assert not problems, problems


def test_rag_eval_all_empty_docs_regression(spark, tmp_path):
    """r10 fuzz catch, pinned deterministically: five NULL docs
    collapse every chunk to the same empty-string embedding, so each
    query's own chunk lands at a TIED rank > 1 (query 4's at rank 5
    under the chunk_id tiebreak) — exercising the non-unit NDCG gain
    literals whose bare-decimal form DuckDB lexed as DECIMAL and
    converted to DOUBLE one ulp off Python's parse. The fix formats
    oracle-embedded non-dyadic doubles in e-notation."""
    problems = _run(spark, tmp_path, [None] * 5, "rag_eval_retrieval")
    assert not problems, problems


# Long repeated phrases guarantee real 13-gram overlap between the
# bench (doc_id < 10) and corpus (doc_id >= 10) sides — the generic
# generator's ids never cross the split, so the decontamination pair
# (pooled collisions + per-item containment) gets its own fuzz whose
# rows straddle it, including full-quote contamination (containment
# 1.0) and NULL/empty docs on both sides.
_PHRASES = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "sphinx of black quartz judge my vow",
]
_contam_doc = st.one_of(
    st.none(),
    st.just(""),
    st.lists(st.sampled_from(_PHRASES), min_size=1, max_size=3).map(". ".join),
)


@settings(**_SETTINGS)
@given(
    bench=st.lists(_contam_doc, min_size=1, max_size=3),
    corpus=st.lists(_contam_doc, min_size=1, max_size=4),
)
@pytest.mark.parametrize(
    "name", ["corpus_decontaminate", "corpus_decontaminate_containment"]
)
def test_decontamination_matches_oracle_across_the_id_split(
    spark, tmp_path, name, bench, corpus
):
    docs = {i: t for i, t in enumerate(bench)}
    docs.update({10 + i: t for i, t in enumerate(corpus)})
    rows = [
        (i, t, "en", f"src{i % 2}", len(t) if t else 0)
        for i, t in sorted(docs.items())
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "documents.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    q = registry.QUERIES[name]
    problems = compare(name, q.fn(spark, sf_dir), con, q.oracle)
    assert not problems, problems
