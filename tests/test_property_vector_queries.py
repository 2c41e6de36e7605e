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

DIM = 8

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
