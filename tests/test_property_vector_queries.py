"""End-to-end hypothesis fuzz for the embeddings-only oracled queries:
generate vector tables stressing what the fixture generator never
emits — all-zero vectors (the zero-norm guard), exactly duplicated
vectors (score ties → the neighbor-id tiebreaker), negatives — and
demand the registered Spark plan and its DuckDB oracle agree exactly.

Vector components are exact quarters in float32, so the documented
left-fold dot dialect must match bit-for-bit, not just approximately.
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

# 12, not 8: embedding_label_confusion derives SRP band keys from sign
# tests on dims 1..12 (CONF_BANDS × CONF_BITS) — generated vectors must
# cover every banded dimension or the band keys would go out of range.
DIM = 12

_component = st.integers(min_value=-8, max_value=8).map(lambda v: v / 4)
_vector = st.one_of(
    st.just([0.0] * DIM),  # zero vector — exercises the +1e-24 guard
    st.lists(_component, min_size=DIM, max_size=DIM),
)
_rows = st.lists(
    st.tuples(_vector, st.integers(min_value=0, max_value=3)),  # (vec, label)
    min_size=22,  # several queries split at vec_id < 8 / < 20
    max_size=30,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# Deliberately NOT fuzzed:
# - knn_vectorized_ranks: its oracle is valid under a MEASURED data
#   precondition (min adjacent top-k score gap ≥ 5.7e-5 on the shipped
#   corpora — see its docstring); generated near-tied vectors violate
#   the precondition, so BLAS-vs-fold rank flips there are understood,
#   not bugs.
# - rag_batch_retrieve: joins documents too — not embeddings-only.
QUERIES = [
    "knn_topk_exact",
    "knn_similarity_join",
    "embedding_near_pairs",
    "embedding_label_stats",
    # end-to-end semantic dedup: duplicated vectors force score-1.0
    # edges and multi-member components; the zero vector lands in a
    # cluster only via the guard-defined 0.0 score (never >= threshold)
    "dedup_semantic_canonicals",
    # hard negatives: duplicate vectors create exact score ties (the
    # unique vec_id tiebreaker must resolve them identically), zero
    # vectors score 0.0 via the norm guard
    "embedding_hard_negatives",
    # mutual-NN: duplicate vectors create exact-tie top-1 races the
    # unique dst tiebreaker must resolve identically on both engines
    "embedding_mutual_nn",
    # r8: deterministic-centroid assignment + cohesion band (struct-max
    # tie-breaks on duplicate/zero vectors), the quantized-distance
    # outlier z-gate (N=1 clusters ⇒ variance 0, strict > keeps the
    # lone member), and centroid drift (all-zero vectors exercise the
    # zero-norm guard on the summed vectors)
    "embedding_cluster_profile",
    "embedding_outlier_flags",
    "embedding_label_centroid_drift",
    # 1-NN confusion: duplicate vectors make exact score ties — the
    # (cos, -nb) struct-max must agree with the oracle's rn tiebreak
    "embedding_label_confusion",
    # r9 integer-exact MMR twin: duplicate/zero vectors collapse rel_q
    # and sim_q to exact integer ties — the Python loop's
    # earliest-position rule must match the recursive CTE's
    # (val, rel_q, vec_id) ORDER BY per step
    "rag_mmr_diversify_exact",
    # r11 int8 scalar quantization: duplicated vectors collapse dims
    # to narrow ranges, the all-zero vector can make width-0 dims
    # (the code-0 guard), and exact-quarter components put values
    # exactly ON code boundaries — floor + least(255) must agree
    "embedding_sq_int8_report",
    # r12 graph ANN: duplicate vectors force cosine ties in BOTH the
    # M-NN adjacency build (sim DESC, dst ASC) and the per-round beam
    # cuts (score DESC, vec_id ASC); zero vectors hit the 1e-24 norm
    # guard inside graph edges; ≥22 rows keep the 4 spread entries
    # distinct-ish and the 6-round walk non-degenerate
    "ann_graph_portable",
    # r12 NSW insert-order variant: the triangular (dst < src) build
    # join under duplicate/zero vectors (ties in BOTH the prior-only
    # top-M and the walk), hub back-edges from early nodes
    "ann_graph_nsw_portable",
]


def _run(spark, tmp_path, rows, query_name, dup_every=3):
    data = []
    for i, (vec, label) in enumerate(rows):
        # force exact duplicates: every dup_every-th row repeats the
        # previous vector → tied scores → tiebreaker ordering matters
        if i % dup_every == 0 and i > 0:
            vec = data[i - 1][1]
        data.append((i, vec, label))
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        data, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE OR REPLACE VIEW embeddings AS "
        f"SELECT * FROM '{sf_dir}/embeddings.parquet/*.parquet'"
    )
    q = registry.QUERIES[query_name]
    return compare(query_name, q.fn(spark, sf_dir), con, q.oracle)


@settings(**_SETTINGS)
@given(rows=_rows)
@pytest.mark.parametrize("name", QUERIES)
def test_vector_query_matches_oracle_on_generated_embeddings(
    spark, tmp_path, name, rows
):
    problems = _run(spark, tmp_path, rows, name)
    assert not problems, problems


def test_mmr_exact_single_candidate(spark, tmp_path):
    """r9 ADVICE: with exactly ONE candidate (query vec 0 + one other
    vector) the pairwise-sims relation is empty — the left join +
    empty-array coalesce must keep the candidate and emit the rank-1
    row exactly like the recursive-CTE oracle (the old inner join
    silently returned 0 rows)."""
    rows = [([1.0] * DIM, 0), ([0.5] * DIM, 1)]
    problems = _run(spark, tmp_path, rows, "rag_mmr_diversify_exact")
    assert not problems, problems


def _allpairs_confusion(spark, sf_dir):
    """The exact (pre-r9) all-pairs 1-NN confusion matrix — kept as the
    fixture-scale differential for the banded candidate query."""
    from pyspark.sql import functions as F

    from rag_lakehouse_spark.functions import vector as VEC
    from rag_lakehouse_spark.plans.vector_queries import (
        _normed,
        confusion_from_candidates,
    )
    from rag_lakehouse_spark.sources.tables import load_table

    e = _normed(load_table(spark, sf_dir, "embeddings"))
    a = e.select("vec_id", F.col("label").alias("label_a"), "embedding", "nrm")
    b = e.select(
        F.col("vec_id").alias("nb"),
        F.col("label").alias("label_b"),
        F.col("embedding").alias("bemb"),
        F.col("nrm").alias("bnrm"),
    )
    s = (
        a.crossJoin(b)
        .filter(F.col("nb") != F.col("vec_id"))
        .select(
            "vec_id",
            "label_a",
            "label_b",
            "nb",
            (
                VEC.dot("embedding", "bemb")
                / (F.col("nrm") * F.col("bnrm") + F.lit(1e-24))
            ).alias("cos"),
        )
    )
    return confusion_from_candidates(s)


def test_label_confusion_equals_exact_when_buckets_are_total(spark, tmp_path):
    """When every vector lands in the same SRP buckets (all banded dims
    non-negative), the candidate set IS all pairs — the banded query
    must reproduce the exact confusion matrix cell-for-cell."""
    import random

    from rag_lakehouse_spark.plans import registry as reg

    rng = random.Random(7)
    data = []
    for i in range(40):
        # dims 1..12 strictly positive → identical band keys (15,15,15);
        # remaining dims free, incl. negatives
        vec = [rng.uniform(0.05, 1.0) for _ in range(12)] + [
            rng.uniform(-1.0, 1.0) for _ in range(4)
        ]
        data.append((i, [float(v) for v in vec], i % 4))
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        data, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    )
    got = {
        (r.label_a, r.label_b): r.n
        for r in reg.QUERIES["embedding_label_confusion"].fn(spark, sf_dir).collect()
    }
    want = {
        (r.label_a, r.label_b): r.n for r in _allpairs_confusion(spark, sf_dir).collect()
    }
    assert got == want


def test_label_confusion_recall_floor_on_fixture(spark, sf_dir):
    """Recall readout on the real sf0.001 embeddings: the banded
    candidate top-1 must agree with the exact all-pairs top-1 on most
    vectors (measured 417/500 cell overlap at 3 bands × 4 bits), and no
    vector may silently drop (every sf0.001 vector shares ≥1 bucket)."""
    from rag_lakehouse_spark.plans import registry as reg

    cand = {
        (r.label_a, r.label_b): r.n
        for r in reg.QUERIES["embedding_label_confusion"].fn(spark, sf_dir).collect()
    }
    exact = {
        (r.label_a, r.label_b): r.n for r in _allpairs_confusion(spark, sf_dir).collect()
    }
    n_exact = sum(exact.values())
    assert sum(cand.values()) == n_exact, "no vector should drop at this scale"
    overlap = sum(
        min(exact.get(k, 0), cand.get(k, 0)) for k in set(exact) | set(cand)
    )
    assert overlap >= 0.7 * n_exact


# ann_pq_portable is NOT in the hypothesis QUERIES list: it indexes all
# 64 embedding dims (8 subspaces × 8 dims) and the generated vectors are
# DIM=12; raising the shared fuzz DIM to 64 would slow every row for one
# query's benefit. Its generated-table coverage is the targeted
# differential below, which forces the two spots fixture data cannot:
# exact argmin TIES (midpoint vectors between two quarter-coordinate
# centroids — products are exact in double, so both distances carry
# identical bits and the first-index rule must fire identically in both
# engines) and duplicated vectors (tied ADC → neighbor_id tiebreak).
def test_ann_pq_portable_ties_on_constructed_vectors(spark, tmp_path):
    from rag_lakehouse_spark.plans import registry as reg
    from rag_lakehouse_spark.plans.vector_queries import (
        _PQ_K,
        _PQ_M,
        _PQ_SUB,
        _pq_cb,
    )

    rng_vals = [(-5, 3), (7, -2), (1, 1), (-3, -7), (2, 6), (0, -1)]
    data = []
    # vec 0 = the query: exact eighths
    data.append((0, [((i * 3) % 9 - 4) / 8.0 for i in range(64)], 0))
    # midpoint vectors: subspace j sits exactly between centroids 0 and 1
    for n in range(1, 12):
        vec = []
        for j in range(_PQ_M):
            for t in range(_PQ_SUB):
                mid = (_pq_cb(j, 0, t) + _pq_cb(j, 1, t)) / 2.0  # exact eighth
                vec.append(mid if (n + j) % 2 == 0 else ((n * 5 + t) % 9 - 4) / 8.0)
        data.append((n, vec, n % 3))
    # exact duplicates → tied ADC distances → vec_id tiebreak
    data.append((12, data[3][1], 1))
    data.append((13, data[3][1], 2))
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        data, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE OR REPLACE VIEW embeddings AS "
        f"SELECT * FROM '{sf_dir}/embeddings.parquet/*.parquet'"
    )
    q = reg.QUERIES["ann_pq_portable"]
    problems = compare("ann_pq_portable", q.fn(spark, sf_dir), con, q.oracle)
    assert not problems, problems


def test_pq_compression_report_on_constructed_vectors(spark, tmp_path):
    """r11: the PQ diagnostics report under the same tie-forcing
    construction as the ADC twin — midpoint vectors make subspace
    assignment distances bit-identical between centroids 0 and 1, so
    the smaller-code rule must fire identically in both engines or the
    (subspace, code) group counts shift; duplicated vectors double
    exact grid-floored error mass in one group."""
    from rag_lakehouse_spark.plans import registry as reg
    from rag_lakehouse_spark.plans.vector_queries import (
        _PQ_M,
        _PQ_SUB,
        _pq_cb,
    )

    data = []
    data.append((0, [((i * 3) % 9 - 4) / 8.0 for i in range(64)], 0))
    for n in range(1, 12):
        vec = []
        for j in range(_PQ_M):
            for t in range(_PQ_SUB):
                mid = (_pq_cb(j, 0, t) + _pq_cb(j, 1, t)) / 2.0
                vec.append(mid if (n + j) % 2 == 0 else ((n * 5 + t) % 9 - 4) / 8.0)
        data.append((n, vec, n % 3))
    data.append((12, data[3][1], 1))
    data.append((13, data[3][1], 2))
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        data, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE OR REPLACE VIEW embeddings AS "
        f"SELECT * FROM '{sf_dir}/embeddings.parquet/*.parquet'"
    )
    q = reg.QUERIES["embedding_pq_compression_report"]
    problems = compare(
        "embedding_pq_compression_report", q.fn(spark, sf_dir), con, q.oracle
    )
    assert not problems, problems


def test_knn_ivf_portable_ties_on_constructed_vectors(spark, tmp_path):
    """Generated-table differential for the frozen-quantizer IVF twin
    (64-dim, so outside the shared DIM=12 fuzz — same rationale as the
    PQ twin above): midpoint vectors force exact assignment ties (the
    first-index rule must fire identically), duplicates force tied
    cosine scores (neighbor_id tiebreak), and a query placed at a
    centroid pins the probe set."""
    from rag_lakehouse_spark.plans import registry as reg
    from rag_lakehouse_spark.plans.vector_queries import _ivf_cent

    data = []
    # query = exactly centroid 2 → probe cells deterministic
    data.append((0, [_ivf_cent(2, t) for t in range(64)], 0))
    # midpoints between centroids 0 and 1 → exact assignment tie
    mid = [(_ivf_cent(0, t) + _ivf_cent(1, t)) / 2.0 for t in range(64)]
    data.append((1, mid, 1))
    data.append((2, mid, 2))  # duplicate → tied score
    # vectors near each centroid (exact eighths offset)
    for n in range(3, 20):
        c = n % 8
        data.append(
            (n, [_ivf_cent(c, t) + ((n + t) % 3 - 1) / 8.0 for t in range(64)], n % 4)
        )
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        data, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE OR REPLACE VIEW embeddings AS "
        f"SELECT * FROM '{sf_dir}/embeddings.parquet/*.parquet'"
    )
    q = reg.QUERIES["knn_ivf_portable"]
    problems = compare("knn_ivf_portable", q.fn(spark, sf_dir), con, q.oracle)
    assert not problems, problems


def test_ivf_balance_report_on_constructed_vectors(spark, tmp_path):
    """r11: the cell-balance report under the same construction —
    midpoint vectors force exact assignment ties (first-index rule
    shifts a whole vector between cells 0 and 1 if it fires
    differently), duplicates double one cell's exact grid error
    mass, and centroid-exact vectors contribute dmin = 0."""
    from rag_lakehouse_spark.plans import registry as reg
    from rag_lakehouse_spark.plans.vector_queries import _ivf_cent

    data = []
    data.append((0, [_ivf_cent(2, t) for t in range(64)], 0))
    mid = [(_ivf_cent(0, t) + _ivf_cent(1, t)) / 2.0 for t in range(64)]
    data.append((1, mid, 1))
    data.append((2, mid, 2))
    for n in range(3, 20):
        c = n % 8
        data.append(
            (n, [_ivf_cent(c, t) + ((n + t) % 3 - 1) / 8.0 for t in range(64)], n % 4)
        )
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        data, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE OR REPLACE VIEW embeddings AS "
        f"SELECT * FROM '{sf_dir}/embeddings.parquet/*.parquet'"
    )
    q = reg.QUERIES["embedding_ivf_balance_report"]
    problems = compare(
        "embedding_ivf_balance_report", q.fn(spark, sf_dir), con, q.oracle
    )
    assert not problems, problems


def test_ann_ivf_pq_portable_ties_on_constructed_vectors(spark, tmp_path):
    """Generated-table differential for the residual IVF-PQ twin
    (64-dim — outside the shared fuzz, same rationale as above):
    centroid-exact vectors make residuals exactly zero (code argmin
    over pure codebook norms), midpoints force assignment ties, and
    duplicates force tied ADC distances."""
    from rag_lakehouse_spark.plans import registry as reg
    from rag_lakehouse_spark.plans.vector_queries import _ivf_cent

    data = []
    data.append((0, [_ivf_cent(2, t) for t in range(64)], 0))  # query at centroid 2
    mid = [(_ivf_cent(0, t) + _ivf_cent(1, t)) / 2.0 for t in range(64)]
    data.append((1, mid, 1))  # exact assignment tie
    data.append((2, [_ivf_cent(3, t) for t in range(64)], 2))  # zero residual
    data.append((3, [_ivf_cent(3, t) for t in range(64)], 1))  # duplicate → ADC tie
    for n in range(4, 20):
        c = n % 8
        data.append(
            (n, [_ivf_cent(c, t) + ((n * 3 + t) % 5 - 2) / 8.0 for t in range(64)], n % 4)
        )
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        data, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE OR REPLACE VIEW embeddings AS "
        f"SELECT * FROM '{sf_dir}/embeddings.parquet/*.parquet'"
    )
    q = reg.QUERIES["ann_ivf_pq_portable"]
    problems = compare("ann_ivf_pq_portable", q.fn(spark, sf_dir), con, q.oracle)
    assert not problems, problems


def test_ann_ivf_sq_portable_ties_on_constructed_vectors(spark, tmp_path):
    """r11: the IVF-SQ rung under the same 64-dim construction —
    midpoint vectors force exact assignment ties, DUPLICATE vectors
    get identical int8 codes (tied adc_distance → neighbor_id
    tiebreak), centroid-exact vectors sit on range endpoints (code
    255 via the least() clamp), and a constant dimension would hit
    the width-0 guard. The data-trained range table must come out
    identical on both engines for any row to hash-match."""
    from rag_lakehouse_spark.plans import registry as reg
    from rag_lakehouse_spark.plans.vector_queries import _ivf_cent

    data = []
    data.append((0, [_ivf_cent(2, t) for t in range(64)], 0))
    mid = [(_ivf_cent(0, t) + _ivf_cent(1, t)) / 2.0 for t in range(64)]
    data.append((1, mid, 1))
    data.append((2, mid, 2))
    for n in range(3, 20):
        c = n % 8
        data.append(
            (n, [_ivf_cent(c, t) + ((n + t) % 3 - 1) / 8.0 for t in range(64)], n % 4)
        )
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        data, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE OR REPLACE VIEW embeddings AS "
        f"SELECT * FROM '{sf_dir}/embeddings.parquet/*.parquet'"
    )
    q = reg.QUERIES["ann_ivf_sq_portable"]
    problems = compare(
        "ann_ivf_sq_portable", q.fn(spark, sf_dir), con, q.oracle
    )
    assert not problems, problems


# r12: fused retrieval eval joins documents AND embeddings — its own
# dual-table fuzz (the shared _run writes embeddings only). Generated
# duplicate vectors tie the dense ranks, duplicate/NULL texts tie or
# empty the lexical ranks, NULL sources empty a query's rel-1 set
# (rel-2 self-retrieval must still score), and tiny corpora make the
# fused top-10 mostly judged-irrelevant — the graded tail's coalesce
# paths fire on both engines.
_fz_words = ["aa", "bb", "cc", "vector", "merge", "日本", "aa bb"]
_fz_doc = st.one_of(
    st.none(),
    st.lists(st.sampled_from(_fz_words), max_size=6).map(" ".join),
)


@settings(**_SETTINGS)
@given(rows=_rows, docs=st.lists(_fz_doc, min_size=5, max_size=12))
def test_rag_eval_fused_matches_oracle_on_generated_inputs(
    spark, tmp_path, rows, docs
):
    sf_dir = str(tmp_path)
    data = []
    for i, (vec, label) in enumerate(rows):
        if i % 3 == 0 and i > 0:
            vec = data[i - 1][1]
        data.append((i, vec, label))
    spark.createDataFrame(
        data, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    )
    doc_rows = [
        (
            i,
            t,
            "en",
            None if i % 5 == 4 else f"src{i % 2}",
            len(t) if t else 0,
        )
        for i, t in enumerate(docs)
    ]
    spark.createDataFrame(
        doc_rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "documents.parquet")
    )
    con = duckdb.connect()
    for t in ("embeddings", "documents"):
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet/*.parquet'"
        )
    q = registry.QUERIES["rag_eval_fused"]
    problems = compare("rag_eval_fused", q.fn(spark, sf_dir), con, q.oracle)
    assert not problems, problems
