#!/usr/bin/env python3
"""Round-16 optimization profiler: per-query timing + formatted-plan dump.

Bench-frame methodology (same as bench.py): a FRESH DataFrame per run,
timer starts BEFORE construction, action = collect(). Additionally
dumps ``.explain("formatted")`` to plans/r16/<query>_<tag>.txt so plan
claims in OPTIMIZATION_r16.md are checkable without running Spark.

Unlike the r15 profiler this uses the PUBLIC ``df.explain(mode=...)``
API captured via stdout redirect (ADVICE r15 #4 — the private
``PythonSQLUtils.explainString`` breaks across Spark versions).

Usage:
  python3 scripts/profile_r16.py --tag before q1_pricing_summary
  python3 scripts/profile_r16.py --tag before --headline       # bench set
  python3 scripts/profile_r16.py --no-plan --runs 5 <query>    # timing only
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--headline", action="store_true")
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--no-time", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from rag_lakehouse_spark.plans import registry
    from rag_lakehouse_spark.session import get_spark

    names = list(args.queries)
    if args.headline:
        import bench

        names = [n for n in bench.HEADLINE if n not in names] + names

    spark = get_spark("profile_r16")
    qs = registry.queries()
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16")
    os.makedirs(outdir, exist_ok=True)

    # one warmup at sf0.001 mirrors bench.py's codegen warmup
    warmup_sf = "/root/testdata/sf0.001"
    results = {}
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}")
            continue
        spark.sparkContext.setJobDescription(f"r16:{args.tag}:{name}")
        if not args.no_plan:
            df = qs[name](spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            with open(os.path.join(outdir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(buf.getvalue())
        if args.no_time:
            print(f"{name}: plan dumped")
            continue
        if os.path.isdir(warmup_sf):
            try:
                qs[name](spark, warmup_sf).count()
            except Exception:
                pass
        runs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            qs[name](spark, args.sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        med = runs[len(runs) // 2]
        results[name] = med
        print(f"{name}: median {med:.3f}s  runs={[round(r, 3) for r in runs]}")
        spark.sparkContext.setJobDescription(None)
    if results:
        print("TOTAL(median):", round(sum(results.values()), 3))


if __name__ == "__main__":
    main()
