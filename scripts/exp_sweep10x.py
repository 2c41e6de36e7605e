#!/usr/bin/env python3
"""r16 10x sweep (VERDICT r15 #6/#8/#10): run the scale-sensitive rows
against the K=10 replica corpus (scripts/make_scaled_sf.py ->
.tmp_sfbig) where the r15 wins are actually visible, plus the
dup-span one-aggregate vs two-step A/B the r15 verdict asked to
re-measure.

Usage:
  python3 scripts/exp_sweep10x.py sweep     # timed rows at 10x
  python3 scripts/exp_sweep10x.py dupspan   # one-agg vs two-step A/B
  python3 scripts/exp_sweep10x.py twins     # streaming twins equal batch at 10x
  python3 scripts/exp_sweep10x.py canon10x  # components fold vs DuckDB recursive CTE at 10x
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

BIG = "/root/repo/.tmp_sfbig"


def _timed(name, fn, runs=3):
    out = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        out.append(round(time.perf_counter() - t0, 3))
    out.sort()
    print(f"{name}: median {out[len(out)//2]:.3f}s runs={out}")
    return out[len(out) // 2]


def duplicate_windows_twostep(wins: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The r14 two-aggregate owner rule (min id, then min pos within
    that id) — kept here verbatim as the A/B referent for the r15
    one-aggregate min(struct(id,pos)) rewrite."""
    occ = wins.groupBy("whash").agg(
        F.count(F.lit(1)).alias("cnt"), F.min(id_col).alias("__odoc")
    )
    own = (
        wins.join(occ, "whash")
        .filter(F.col(id_col) == F.col("__odoc"))
        .groupBy("whash", "cnt", "__odoc")
        .agg(F.min("pos").alias("__opos"))
    )
    return (
        wins.join(own, "whash")
        .filter(
            (F.col("cnt") > 1)
            & ~((F.col(id_col) == F.col("__odoc")) & (F.col("pos") == F.col("__opos")))
        )
        .select(F.col(id_col), F.col("pos"))
    )


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "sweep"
    from rag_lakehouse_spark.plans.registry import queries
    from rag_lakehouse_spark.session import get_spark

    spark = get_spark("exp_sweep10x")
    qs = queries()
    assert os.path.isdir(BIG), "run scripts/make_scaled_sf.py first"

    if mode == "sweep":
        rows = [
            "corpus_heavy_tokens",
            "corpus_countmin_portable",
            "corpus_dup_span_stats",
            "dedup_ngram_jaccard",
        ]
        for name in rows:  # warm at sf0.1 first (JIT)
            qs[name](spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
        for name in rows:
            _timed(f"{name}@10x", lambda n=name: qs[n](spark, BIG))
    elif mode == "dupspan":
        from rag_lakehouse_spark.operators.substring_dedup import (
            dup_span_stats,
            duplicate_windows,
            token_windows,
        )
        from rag_lakehouse_spark.sources.tables import load_table

        def run(variant, sf_dir):
            d = load_table(spark, sf_dir, "documents")
            wins = token_windows(d, "text", "doc_id", 15).localCheckpoint(eager=True)
            fn = duplicate_windows if variant == "oneagg" else duplicate_windows_twostep
            return fn(wins, "doc_id").groupBy("doc_id").agg(
                F.count(F.lit(1)).alias("n_dup_windows")
            )

        # bit-identity of the dup-window sets at 10x
        a = sorted(map(tuple, run("oneagg", BIG).collect()))
        b = sorted(map(tuple, run("twostep", BIG).collect()))
        assert a == b, "owner rules diverge at 10x!"
        print(f"owner rules identical at 10x: {len(a)} docs with dups")
        for sf_dir, tag in (("/root/testdata/sf0.1", "sf0.1"), (BIG, "10x")):
            for variant in ("twostep", "oneagg"):
                _timed(f"dupspan_{variant}@{tag}", lambda v=variant, s=sf_dir: run(v, s))
    elif mode == "canon10x":
        # VERDICT r15 #10 / r14 #5: the canonicals-family fold vs an
        # independent bounded-iteration DuckDB referee AT 10x — see
        # scripts/exp_canon_referee10x.py (the registered recursive-CTE
        # oracle is quadratic in clique size via its `reach` relation
        # and exceeds memory at 10x; the bounded min-label-propagation
        # referee reaches the same fixpoint with |V|-row state).
        raise SystemExit("run: python3 scripts/exp_canon_referee10x.py")
    elif mode == "twins":
        # streaming twins at 10x: maintained result == batch result
        pairs = [
            ("dedup_incremental_stream", "dedup_exact_docs"),
            ("corpus_cms_incremental", "corpus_countmin_portable"),
        ]
        for inc, batch in pairs:
            t0 = time.perf_counter()
            got = sorted(map(tuple, qs[inc](spark, BIG).collect()))
            t1 = time.perf_counter()
            want = sorted(map(tuple, qs[batch](spark, BIG).collect()))
            assert got == want, f"{inc} != {batch} at 10x ({len(got)} vs {len(want)})"
            print(f"{inc}@10x == {batch}@10x: {len(got)} rows (fold {t1-t0:.1f}s)")


if __name__ == "__main__":
    main()
