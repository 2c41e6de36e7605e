"""MMR diversification: the applyInPandas operator must equal an
independent naive implementation (exact-integer vectors make every
similarity bit-exact in both), be invariant to input partitioning,
and actually diversify duplicated candidates."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from rag_lakehouse_spark.operators.mmr import mmr_diversify


def _naive_mmr(cands, k, lam):
    """Independent reimplementation: cands = [(id, vec, score)]."""
    order = sorted(cands, key=lambda c: (-c[2], c[0]))
    sel = []
    out = []
    for rank in range(1, min(k, len(order)) + 1):
        best = None
        for cid, vec, score in order:
            if any(cid == s[0] for s in sel):
                continue
            pen = 0.0
            if sel:
                sims = []
                for sid, svec, _ in sel:
                    dot = sum(a * b for a, b in zip(vec, svec))
                    na = math.sqrt(sum(a * a for a in vec)) + 1e-24
                    nb = math.sqrt(sum(b * b for b in svec)) + 1e-24
                    sims.append(dot / (na * nb))
                pen = max(sims)
            val = lam * score - (1 - lam) * pen
            if best is None or val > best[0]:
                best = (val, cid, vec, score)
        sel.append((best[1], best[2], best[3]))
        out.append((rank, best[1], best[0]))
    return out


def _cand_df(spark, cands, n_parts=1):
    df = spark.createDataFrame(
        [(0, cid, [float(x) for x in vec], float(score)) for cid, vec, score in cands],
        "query_id int, vec_id long, embedding array<double>, score double",
    )
    return df.repartition(n_parts) if n_parts > 1 else df


CANDS = [
    (1, (1, 0, 0, 0), 9.0),
    (2, (1, 0, 0, 0), 8.5),   # duplicate direction of 1
    (3, (0, 1, 0, 0), 8.0),
    (4, (0, 1, 1, 0), 7.5),
    (5, (0, 0, 0, 1), 7.0),
    (6, (2, 0, 0, 0), 6.5),   # another near-dup of 1
    (7, (0, 0, 1, 0), 6.0),
    (8, (1, 1, 1, 1), 5.5),
]


@pytest.mark.parametrize("lam", [0.3, 0.7])
def test_mmr_matches_naive_reference(spark, lam):
    got = sorted(
        (r.rank, r.vec_id, r.mmr_score)
        for r in mmr_diversify(_cand_df(spark, CANDS), k=5, lam=lam).collect()
    )
    want = sorted(_naive_mmr(CANDS, 5, lam))
    assert [(r, i) for r, i, _ in got] == [(r, i) for r, i, _ in want]
    for (_, _, a), (_, _, b) in zip(got, want):
        assert a == b  # exact-integer vectors ⇒ bit-equal scores


def test_mmr_partitioning_invariant(spark):
    one = mmr_diversify(_cand_df(spark, CANDS), k=5, lam=0.7).collect()
    many = mmr_diversify(_cand_df(spark, CANDS, n_parts=7), k=5, lam=0.7).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))


def test_mmr_actually_diversifies(spark):
    rows = mmr_diversify(_cand_df(spark, CANDS), k=3, lam=0.5).collect()
    picked = [r.vec_id for r in sorted(rows, key=lambda r: r.rank)]
    # pure top-k would pick [1, 2, 3]; MMR must defer the duplicate
    # direction (2) behind orthogonal candidates
    assert picked[0] == 1
    assert 2 not in picked[:2]


def test_mmr_query_row_runs(spark, sf_dir):
    from rag_lakehouse_spark.plans import registry

    rows = registry.queries()["rag_mmr_diversify"](spark, sf_dir).collect()
    assert len(rows) == 10
    assert sorted(r.rank for r in rows) == list(range(1, 11))
    assert len({r.vec_id for r in rows}) == 10


def _naive_mmr_quantized(ids, rel_q, sims_q, k, lam_num=7, lam_comp=3):
    """Independent integer reimplementation (set-based, not
    position-based, so tie handling is derived from scratch: among
    equal objective values pick max rel_q then min id)."""
    remaining = set(ids)
    picked = []
    out = []
    rel = dict(zip(ids, rel_q))
    for rank in range(1, min(k, len(ids)) + 1):
        scored = []
        for cid in remaining:
            pen = max((sims_q[(cid, p)] for p in picked), default=0)
            scored.append((lam_num * rel[cid] - lam_comp * pen, rel[cid], cid))
        val, _, cid = max(scored, key=lambda t: (t[0], t[1], -t[2]))
        picked.append(cid)
        remaining.discard(cid)
        out.append((rank, cid, val))
    return out


def test_mmr_quantized_matches_naive():
    import random

    from rag_lakehouse_spark.operators.mmr import mmr_select_quantized

    rng = random.Random(11)
    for trial in range(50):
        n = rng.randint(1, 12)
        ids = list(range(n))
        # small value range → frequent exact ties, stressing the
        # earliest-position rule against the naive (max rel, min id) rule
        rel_q = [rng.randint(-3, 3) for _ in ids]
        sims_q = {
            (a, b): rng.randint(-3, 3) for a in ids for b in ids if a != b
        }
        # symmetric like real cosine sims
        for a in ids:
            for b in ids:
                if a < b:
                    sims_q[(b, a)] = sims_q[(a, b)]
        order = sorted(ids, key=lambda i: (-rel_q[i], i))
        got = mmr_select_quantized(
            [ids[i] for i in order], [rel_q[i] for i in order], sims_q, k=5
        )
        want = _naive_mmr_quantized(ids, rel_q, sims_q, k=5)
        assert got == want, (trial, got, want)


def test_mmr_quantized_partitioning_invariant(spark, sf_dir):
    from rag_lakehouse_spark.plans import registry

    registry._load_all()
    fn = registry.QUERIES["rag_mmr_diversify_exact"].fn
    rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
    again = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert rows == again and len(rows) == 5
