"""Maximal Marginal Relevance (MMR) result diversification — the
standard post-retrieval step (Carbonell & Goldstein 1998) that trades
relevance against redundancy: greedily pick the candidate maximizing
``lam * relevance - (1 - lam) * max_similarity_to_already_picked``.

Spark shape: retrieval bounds the candidate set per query (top-N from
BM25/dense — the ``rag_retrieve_rerank`` contract), so the greedy loop
runs per-query inside ``applyInPandas`` — one bounded group per query,
thousands of queries diversify in parallel, nothing corpus-sized
touches Python. The loop is inherently sequential per query (each pick
changes the next argmax), which is why it is not an expression; its
determinism contract is below.

Determinism: the group is sorted by (relevance DESC, id ASC) before
the loop and ties in the greedy argmax resolve to the earliest sorted
position, so the selection is a pure function of the candidate SET —
independent of input partitioning and row order (locked by
tests/test_mmr.py, including a repartition-invariance check).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def mmr_select_reference(
    ids: list, vecs: "np.ndarray", scores: list, k: int, lam: float
) -> list[tuple[int, object, float]]:
    """Pure-Python/NumPy greedy MMR over one candidate list (already
    in (score DESC, id ASC) order): returns [(rank, id, mmr_score)].
    Shared by the executor path and the differential test — the
    executor path IS this function, so the test checks the Spark
    plumbing (grouping, ordering, schema), not a reimplementation."""
    v = vecs.astype(np.float64)
    norms = np.linalg.norm(v, axis=1) + 1e-24
    n = len(ids)
    k = min(k, n)
    picked: list[int] = []
    out: list[tuple[int, object, float]] = []
    for rank in range(1, k + 1):
        best_i, best_val = -1, -np.inf
        for i in range(n):
            if i in picked:
                continue
            if picked:
                sims = v[picked] @ v[i] / (norms[picked] * norms[i])
                penalty = float(np.max(sims))
            else:
                penalty = 0.0
            val = lam * scores[i] - (1.0 - lam) * penalty
            if val > best_val:  # strict > ⇒ ties keep the earliest
                best_i, best_val = i, val
        if best_i < 0:
            # Every remaining candidate compared false (NaN scores make
            # `val > best_val` always false). Selecting ids[-1] here
            # would silently emit — and repeat — the LAST candidate;
            # fail loudly instead. Cosine paths guard zero norms with
            # +1e-24, so this is reachable only via NaN inputs.
            raise ValueError(
                f"mmr_select_reference: no selectable candidate at rank "
                f"{rank} (all scores NaN?)"
            )
        picked.append(best_i)
        out.append((rank, ids[best_i], float(best_val)))
    return out


def mmr_diversify(
    candidates: DataFrame,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_col: str = "score",
    k: int = 10,
    lam: float = 0.7,
) -> DataFrame:
    """(query, rank, id, mmr_score): diversified top-k per query from a
    bounded per-query candidate relation."""
    id_field = candidates.schema[id_col]
    out_schema = T.StructType(
        [
            candidates.schema[query_col],
            T.StructField("rank", T.IntegerType()),
            T.StructField(id_field.name, id_field.dataType),
            T.StructField("mmr_score", T.DoubleType()),
        ]
    )

    def per_query(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [score_col, id_col], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        vecs = np.array([np.asarray(x) for x in pdf[vec_col]], dtype=np.float64)
        rows = mmr_select_reference(
            list(pdf[id_col]), vecs, list(pdf[score_col]), k, lam
        )
        q = pdf[query_col].iloc[0]
        return pd.DataFrame(
            [(q, r, i, s) for r, i, s in rows],
            columns=[query_col, "rank", id_col, "mmr_score"],
        )

    return (
        candidates.select(query_col, id_col, vec_col, score_col)
        .groupBy(query_col)
        .applyInPandas(per_query, out_schema)
    )


def mmr_select_quantized(
    ids: list,
    rel_q: list[int],
    sims_q: dict,
    k: int,
    lam_num: int = 7,
    lam_comp: int = 3,
) -> list[tuple[int, object, int]]:
    """Integer-exact greedy MMR over one candidate list: maximize
    ``lam_num * rel_q - lam_comp * max_sim_q`` per step (λ = 0.7 as the
    integer pair 7/3 over a common ×10 scale). Inputs arrive in
    (rel_q DESC, id ASC) order and ties keep the earliest position —
    identical to the oracle's ``ORDER BY val DESC, rel_q DESC, id``.
    ``sims_q[(a, b)]`` must cover every ordered candidate pair; a
    missing pair is a caller bug and raises KeyError. Returns
    [(rank, id, mmr_q)] — every value a plain int, so the DuckDB
    recursive-CTE twin reproduces the selection bit-for-bit."""
    n = len(ids)
    k = min(k, n)
    picked: list[int] = []  # order matters for the penalty max
    picked_set: set[int] = set()  # O(1) membership for the skip test
    out: list[tuple[int, object, int]] = []
    for rank in range(1, k + 1):
        best_i, best_val = -1, None
        for i in range(n):
            if i in picked_set:
                continue
            pen = (
                max(sims_q[(ids[i], ids[p])] for p in picked) if picked else 0
            )
            val = lam_num * rel_q[i] - lam_comp * pen
            if best_val is None or val > best_val:  # strict > ⇒ earliest wins ties
                best_i, best_val = i, val
        # No `best_i < 0` guard here, unlike mmr_select_reference: the
        # `best_val is None` seed accepts the FIRST unpicked candidate
        # unconditionally, and all-integer inputs cannot be NaN, so
        # best_i >= 0 holds by construction (k <= n guarantees an
        # unpicked candidate exists each round). Don't "fix" this to
        # match the float sibling — its guard exists only because
        # float NaN makes `val > best_val` universally false.
        picked.append(best_i)
        picked_set.add(best_i)
        out.append((rank, ids[best_i], int(best_val)))
    return out


def mmr_diversify_quantized(
    candidates: DataFrame,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    k: int = 5,
    lam_num: int = 7,
    lam_comp: int = 3,
) -> DataFrame:
    """(query, rank, id, mmr_q): integer-exact diversified top-k per
    query. ``candidates`` carries per-row ``rel_q`` (quantized
    relevance, bigint) and ``sims`` (array<struct<nb, sim_q>> — the
    quantized similarity to every OTHER candidate of the same query),
    both produced by Spark-side bit-identical expressions, so the only
    Python arithmetic is integer compares. Same applyInPandas plumbing
    as ``mmr_diversify`` — one bounded group per query."""
    out_schema = T.StructType(
        [
            candidates.schema[query_col],
            T.StructField("rank", T.IntegerType()),
            T.StructField(id_col, candidates.schema[id_col].dataType),
            T.StructField("mmr_q", T.LongType()),
        ]
    )

    def per_query(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["rel_q", id_col], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        sims_q: dict = {}
        for a, lst in zip(pdf[id_col], pdf["sims"]):
            for s in lst:
                sims_q[(a, s["nb"])] = int(s["sim_q"])
        rows = mmr_select_quantized(
            list(pdf[id_col]),
            [int(x) for x in pdf["rel_q"]],
            sims_q,
            k,
            lam_num,
            lam_comp,
        )
        q = pdf[query_col].iloc[0]
        return pd.DataFrame(
            [(q, r, i, v) for r, i, v in rows],
            columns=[query_col, "rank", id_col, "mmr_q"],
        )

    return (
        candidates.select(query_col, id_col, "rel_q", "sims")
        .groupBy(query_col)
        .applyInPandas(per_query, out_schema)
    )
