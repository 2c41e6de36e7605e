"""corpus_from_crawl capstone: plan-shape and conservation tests.

The differential oracle (tests/test_oracle.py + the driver) carries
the value evidence; these tests pin the SCALE properties the plan must
keep — parse-once ingest, broadcast blocklist, a single narrow dedup
shuffle with the text column dropped before it — plus the accounting
identities a governance sheet must satisfy (every fetch lands in
exactly one bucket; char mass is conserved end-to-end through the
container round-trip).
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from rag_lakehouse_spark.plans.crawl_queries import (
    MIRROR_OFFSET,
    corpus_from_crawl,
)
from rag_lakehouse_spark.sources.tables import load_table


def test_mirror_offset_transparent_to_every_gate_formula():
    """The mirror offset must be ≡ 0 mod every modulus a fetch formula
    uses (host, status, injection, mirror selection), so a mirror
    replays its primary's gate path exactly — the property the
    'drop:duplicate' bucket construction relies on."""
    for k in (4, 5, 6, 7, 9, 11, 13, 23):
        assert MIRROR_OFFSET % k == 0


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_corpus_from_crawl_plan_shape(spark, sf_dir):
    df = corpus_from_crawl(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # parse-once: exactly one Arrow codec stage walks the archives
    assert plan.count("FlatMapGroupsInPandas") == 1
    # blocklist arrives broadcast, never as a cartesian product
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    # the dedup shuffle must carry NARROW rows: the fpk exchange's
    # input may not include the text column (gates + fingerprint are
    # evaluated map-side, text dropped before the shuffle)
    fmt = _formatted_plan(df)
    fpk_exchanges = [
        blk
        for blk in fmt.split("\n\n")
        if "Exchange" in blk and "hashpartitioning(fpk" in blk
    ]
    assert fpk_exchanges, f"no fpk exchange found:\n{fmt[:2000]}"
    for blk in fpk_exchanges:
        assert "text#" not in blk, blk


def test_corpus_from_crawl_accounting_conserved(spark, sf_dir):
    """Every fetch lands in exactly one bucket; char mass (including
    the injected defect chars) is conserved through the WARC
    round-trip; every drop reason and every shard is exercised at the
    smallest SF."""
    rows = {r["bucket"]: r for r in corpus_from_crawl(spark, sf_dir).collect()}
    reasons = {
        "drop:http_status",
        "drop:blocklist",
        "drop:encoding",
        "drop:quality",
        "drop:duplicate",
    }
    shards = {f"shard:{i}" for i in range(8)}
    assert set(rows) == reasons | shards

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.length(F.coalesce("text", F.lit(""))).alias("n"))
        .collect()
    )
    exp_docs = exp_chars = 0
    for r in docs:
        cids = [r["doc_id"]]
        if r["doc_id"] % 9 == 4:
            cids.append(r["doc_id"] + MIRROR_OFFSET)
        for cid in cids:
            exp_docs += 1
            # injected chars: U+FFFD (1), 'â€™' (3), BEL (1)
            exp_chars += (
                r["n"]
                + (1 if cid % 7 == 0 else 0)
                + (3 if cid % 5 == 0 else 0)
                + (1 if cid % 11 == 0 else 0)
            )
    assert sum(r["n_docs"] for r in rows.values()) == exp_docs
    assert sum(r["total_chars"] for r in rows.values()) == exp_chars
    # mirrors always lose the canonical race -> at least one duplicate
    assert rows["drop:duplicate"]["n_docs"] > 0


def test_incremental_report_equals_batch_report(spark, sf_dir):
    """The streaming-maintained crawl report must equal the one-shot
    batch capstone ROW FOR ROW (the shared oracle checks both against
    DuckDB; this pins them against each other directly), including
    after an out-of-order replay — the fold's order-independence
    claim."""
    import os

    from pyspark.sql import functions as F

    from rag_lakehouse_spark.plans.crawl_queries import (
        _crawl_fetch_set,
        corpus_from_crawl,
    )
    from rag_lakehouse_spark.streaming.crawl_sink import (
        _crawl_merge,
        _crawl_partials,
        read_crawl_report,
    )
    from rag_lakehouse_spark.streaming.rollup_sink import fold_batch

    import tempfile

    batch = {
        tuple(sorted(r.asDict().items()))
        for r in corpus_from_crawl(spark, sf_dir).collect()
    }
    fetches = _crawl_fetch_set(spark, sf_dir)
    # REVERSED id order: mirrors (the duplicate copies) arrive FIRST,
    # primaries later — the canonical must still be the global min id
    max_id = fetches.agg(F.max("crawl_id")).first()[0]
    state = os.path.join(
        tempfile.mkdtemp(prefix="rls_crawl_eq_"), "report"
    )
    bounds = [max_id + 1, 4_000_000, 300, 0]  # mirrors, high, low ids
    for i in range(3):
        b = fetches.filter(
            (F.col("crawl_id") < bounds[i])
            & (F.col("crawl_id") >= bounds[i + 1])
        )
        fold_batch(
            spark,
            state,
            b,
            i,
            partial_fn=lambda bb: _crawl_partials(spark, bb),
            merge_fn=_crawl_merge,
        )
    got = {
        tuple(sorted(r.asDict().items()))
        for r in read_crawl_report(spark, state).collect()
    }
    assert got == batch


import pytest

# r16 (VERDICT r15 #2): long referee family - excluded from the
# default fast run; seal runs use -m "slow or not slow".
pytestmark = pytest.mark.slow
