#!/usr/bin/env python3
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {name: sec, ...}, "queries_rel": {name: ratio, ...},
     "sf": <sf>}

Informational extras (per-query DuckDB anchor seconds, warmup list,
cold first-run timings) are written to the ``bench_details.json``
sidecar (r16, VERDICT r15 #1): at ~4 KB the single line was clipped by
the driver's capture buffer two rounds running — the contract keys and
the timing methodology are unchanged, only the extras moved off-line.

"queries_rel" (r12) is each query's median divided by the Spark anchor
interpolated at its suite position — contention-TOLERANT units: on a
loaded host absolute seconds inflate but these ratios hold, so
round-over-round canary bands are stated in anchor-relative units.
"bands_eligible" (r13) is True only when the run may quote per-query
rel bands: anchors not contended AND value_rel within 10% of the
quiet-host reference. "r1_suite_total"/"r1_suite_vs_baseline" (r13)
emit the 15-query round-over-round comparable directly.

Each query executes to completion via collect() ON A FRESH DataFrame
per run (r11, VERDICT r10 #3): count() over an aggregate-tail plan
lets Catalyst PRUNE the aggregate expressions entirely (the r9
measurement-trap rule), and re-collecting the same DataFrame object
reuses shuffle files — both under-measure. Headline results are
small (top-k / grouped summaries), so driver serialization is noise.
Set SPARK_GRAFT_BENCH_ACTION=count to reproduce the pre-r11 action
for anchor-mapping runs (the r1 22.5 s baseline was count()-based;
ROUND_NOTES r11 records the dual-action mapping).

Each query is timed SPARK_GRAFT_BENCH_RUNS times (default 3);
"queries" carries the per-query MEDIAN (robust to one-off scheduler
hiccups — r2 recorded a 21.5 s outlier on a query that reproduces at
1.6-2.7 s) and "cold" carries the first-run wall time for anyone who
cares about cold-start.

"duckdb" (in the sidecar) records the wall time of each headline
query's oracle SQL on single-node DuckDB over the same parquet — the
engine-external anchor for the <=2x perf gate (the reference publishes
no timings). Each oracle gets one untimed warm run (symmetric with the
Spark warmup); anchor failures are recorded under "duckdb_error" on
the bench line instead of being silently dropped. Queries without an
oracle (probabilistic dedup, BLAS knn) have no entry. Set
SPARK_GRAFT_SKIP_DUCKDB=1 to skip the anchor pass.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family, weighted toward the
# scale-sensitive paths (joins, windows, dedup self-join, knn).
HEADLINE = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "window_rank_top_orders",
    "events_sessionize",
    "events_tumbling_hourly",
    "text_token_stats",
    "dedup_exact_docs",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    # dedup_simhash (fingerprint-only) dropped in r8: a strict subset
    # of dedup_simhash_pairs, which now has two rounds of history
    # (VERDICT r7 #6) — trims ~2.3 s of headline overlap.
    "dedup_simhash_pairs",
    "dedup_incremental_stream",
    "corpus_dup_span_stats",
    "rag_bm25_topk",
    # r7-tail canaries: the export composition (shingle+dedup+shard
    # machinery in one plan) and the mapInPandas/Arrow sketch path
    "corpus_export_manifest",
    "corpus_heavy_tokens",
    # r8 canary: the two-phase distributed prefix scan (range chunk →
    # subtotals → broadcast offsets → local windows) — first-measured
    # this round; watch for the localCheckpoint cost drifting
    "corpus_pack_sequences",
    "knn_similarity_join",
    "knn_vectorized_topk",
    # r9 canary: the SRP-band candidate join that replaced the
    # all-pairs confusion matrix — first-measured this round; watch
    # the band equi-join + argmax shape like the other LSH canaries
    "embedding_label_confusion",
    "events_asof_purchase",
    "chunk_fixed_docs",
    "rag_retrieve_context",
    # r11 canaries: the KN bigram LM (checkpointed type table + the
    # (w1,w2) occurrence equi-join — the round's new self-join shape)
    # and the CMS report (MG + CMS sketch composition, 3 corpus
    # passes). Added AFTER the r11 collect-frame re-anchor; the
    # r1-suite subtotal stays the round-over-round comparable.
    "corpus_kn_bigram_scores",
    "corpus_countmin_portable",
    # r13 canary (VERDICT r12 #5): the codec surface had zero bench
    # coverage — this times the shared parse-once WARC walk
    # (mapInPandas container decode) + per-host aggregation.
    "media_warc_host_report",
)

# The round-over-round comparable (every VERDICT since r11): the 15
# queries of the ORIGINAL r1 headline set, summed from "queries" and
# divided by the 24.9 s collect-frame re-anchored r1 baseline
# (ROUND_NOTES r11 records the count->collect dual-action mapping).
# Emitted directly as r1_suite_total / r1_suite_vs_baseline so readers
# never reconstruct the list from BENCH_r01.json by hand.
R1_SUITE = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "window_rank_top_orders",
    "events_sessionize",
    "events_tumbling_hourly",
    "text_token_stats",
    "dedup_exact_docs",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "knn_similarity_join",
    "knn_vectorized_topk",
    "events_asof_purchase",
    "chunk_fixed_docs",
    "rag_retrieve_context",
)
R1_BASELINE_COLLECT_SEC = 24.9

# Band-eligibility reference (VERDICT r12 #5): per the standing canary
# rule, per-query rel bands may only be quoted from a run whose
# value_rel sits within 10% of the quiet-host reference AND whose
# anchors are not contended. The r12 driver run had anchor spread just
# under the 25% flag while its value_rel was 21% over reference —
# nominally "clean" yet band-ineligible; bands_eligible in the JSON
# closes that gap so a reader cannot quote band violations from an
# ineligible run. Reference re-measured whenever HEADLINE changes OR
# the engine itself changes speed class:
# - r13 = 36.5 (two quiet-host readings 35.53 / 38.52 after adding the
#   media_warc_host_report canary).
# - r15 = 33.0 — RE-BASELINED after the optimization round: the round
#   removed ~4-6 s from the suite (construction/CSE/watermark fixes,
#   OPTIMIZATION_r15.md), so a quiet-host run of the optimized engine
#   (measured 30.58 at anchors 1.15-1.43 and 35.38 at anchors
#   1.06-1.16 — the spread is anchor-phase, both protocol-clean) sits
#   outside the OLD ±10% window by construction. 33.0 is the midpoint
#   of the two observed quiet readings; both fall inside its ±10%
#   window (29.7-36.3). The old reference and both readings are kept
#   here and in OPTIMIZATION_r15.md per the keep-old-numbers rule.
VALUE_REL_REF = 33.0

# Sidecar for the informational blocks (duckdb anchor, warmup list,
# cold timings) — written next to this file so the stdout line stays
# well under any capture buffer (VERDICT r15 #1; see main()).
DETAILS_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_details.json"
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from rag_lakehouse_spark.plans import registry
    from rag_lakehouse_spark.session import get_spark

    spark = get_spark("bench")
    qs = registry.queries()

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    action = os.environ.get("SPARK_GRAFT_BENCH_ACTION", "collect")

    def run_once(name: str) -> float:
        # A FRESH DataFrame per run: re-collecting the same object
        # reuses shuffle files and skips every pre-shuffle stage. The
        # timer starts BEFORE construction — for eager queries
        # (streaming replay, localCheckpoint barriers, collected
        # artifacts) construction IS the work; timing only the final
        # action under-measured dedup_minhash_lsh 3.0 -> 0.7 s.
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        if action == "count":
            df.count()
        else:
            df.collect()
        return time.perf_counter() - t0

    # Warm the JVM + file listing once (excluded from timings), plus the
    # heavy codegen/Arrow families at the smallest SF — same generated
    # classes, tiny data — so timings measure engine steady state rather
    # than first-compile JIT (recorded under "warmup" for transparency).
    # q1 warms TWICE with the measured action so the first Spark-anchor
    # reading below is steady-state, not collect-path first-compile (a
    # warm-up-skewed first anchor would false-flag the host as
    # contended).
    warmup_sf = "/root/testdata/sf0.001"
    warmed = ["q1_pricing_summary"]
    run_once("q1_pricing_summary")
    run_once("q1_pricing_summary")
    if os.path.isdir(warmup_sf):
        for name in (
            "dedup_minhash_lsh",
            "dedup_ngram_jaccard",
            "dedup_simhash_pairs",
            "dedup_incremental_stream",
            "corpus_dup_span_stats",
            "corpus_export_manifest",
            "corpus_heavy_tokens",
            "knn_vectorized_topk",
            "media_warc_host_report",
        ):
            if name in qs:
                try:
                    qs[name](spark, warmup_sf).count()
                    warmed.append(name)
                except Exception:  # warmup must never break the bench
                    pass

    # Spark-side anchor (VERDICT r10 #2): the DuckDB anchor measures a
    # DIFFERENT engine, so driver-host contention can inflate Spark
    # timings 2-3x while the DuckDB anchor stays flat (observed r10).
    # Re-time q1 before, mid-suite, and after the suite; if the spread
    # exceeds 25% the host was contended mid-run and the suite numbers
    # should not be compared round-over-round.
    anchor_q = "q1_pricing_summary"
    spark_anchor: dict[str, float] = {}
    # One more untimed anchor run AFTER the sf0.001 warmup loop: the
    # loop JIT-compiles other query families between q1's warmup and
    # this first reading, and the perturbation reproducibly inflated
    # "first" ~1.3x on otherwise-quiet hosts (two r11 runs: first
    # 1.24-1.56 s vs mid/last agreeing at 0.94-1.02 s) — a warmup
    # artifact misread as contention. The contended flag should fire
    # on the HOST, not on the protocol.
    run_once(anchor_q)
    spark_anchor["first"] = round(run_once(anchor_q), 3)

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    live = [n for n in HEADLINE if n in qs]  # drift guard: never break the loop
    for qi, name in enumerate(live):
        if qi == len(live) // 2:
            spark_anchor["mid"] = round(run_once(anchor_q), 3)
        runs: list[float] = []
        for i in range(n_runs):
            runs.append(run_once(name))
        cold[name] = round(runs[0], 3)
        runs.sort()
        timings[name] = round(runs[len(runs) // 2], 3)  # median
    spark_anchor["last"] = round(run_once(anchor_q), 3)
    lo, hi = min(spark_anchor.values()), max(spark_anchor.values())
    anchor_contended = bool(lo > 0 and hi / lo > 1.25)

    # Anchor-RELATIVE ratios (VERDICT r11 #2): host contention inflates
    # every Spark timing roughly proportionally, so a contended run's
    # absolute seconds are unusable but its SHAPE is not. Express each
    # query's median as a ratio to the anchor reading interpolated at
    # its suite position (first/mid/last are timed at positions 0,
    # len/2, len) — canary bands in these units stay comparable
    # round-over-round even on a loaded host, where absolute seconds
    # would force discarding the run (three r11 judge runs were lost
    # to exactly that).
    def anchor_at(pos: float) -> float:
        n = len(live)
        a_first = spark_anchor["first"]
        a_mid = spark_anchor.get("mid", a_first)
        a_last = spark_anchor.get("last", a_mid)
        mid_pos = n / 2
        if n == 0:
            return a_first
        if pos <= mid_pos:
            f = pos / mid_pos if mid_pos else 0.0
            return a_first + f * (a_mid - a_first)
        f = (pos - mid_pos) / (n - mid_pos)
        return a_mid + f * (a_last - a_mid)

    queries_rel = {
        name: round(timings[name] / max(anchor_at(qi + 0.5), 1e-9), 2)
        for qi, name in enumerate(live)
    }
    value_rel = round(sum(queries_rel.values()), 2)
    r1_live = [n for n in R1_SUITE if n in timings]
    r1_total = round(sum(timings[n] for n in r1_live), 3)
    r1_rel = round(sum(queries_rel[n] for n in r1_live), 2)
    # Both references are COLLECT-frame numbers: under the legacy
    # count action the ratio and the eligibility window would be
    # cross-frame nonsense, so they are suppressed rather than
    # emitted wrong (the 'action' key alone would not stop a reader
    # quoting them).
    collect_frame = action == "collect"
    bands_eligible = (
        collect_frame
        and not anchor_contended
        and VALUE_REL_REF is not None
        and abs(value_rel - VALUE_REL_REF) / VALUE_REL_REF <= 0.10
    )
    r1_vs_baseline = (
        round(r1_total / R1_BASELINE_COLLECT_SEC, 3)
        if collect_frame
        else None
    )

    duck_timings: dict[str, float] = {}
    duck_error = None
    if not os.environ.get("SPARK_GRAFT_SKIP_DUCKDB"):
        try:
            duck_timings = duckdb_anchor(sf_dir)
        except Exception as exc:  # the anchor must never break the bench line
            duck_error = f"{type(exc).__name__}: {exc}"

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_suite_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "runs": n_runs,
        "action": action,
        "spark_anchor": spark_anchor,
        "anchor_contended": anchor_contended,
        "queries_rel": queries_rel,
        "value_rel": value_rel,
        "value_rel_ref": VALUE_REL_REF,
        "bands_eligible": bands_eligible,
        "r1_suite_total": r1_total,
        "r1_suite_rel": r1_rel,
        "r1_suite_vs_baseline": r1_vs_baseline,
        "details": DETAILS_PATH,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if duck_error:
        out["duckdb_error"] = duck_error
    # The informational blocks (per-query DuckDB anchor seconds, the
    # warmup list, cold first-run timings) live in a SIDECAR file, not
    # on the stdout line (r16, VERDICT r15 #1): the one-line JSON grew
    # to ~4 KB and the driver's capture clipped it mid-object twice
    # (BENCH_r14 never parsed; BENCH_r15's stored tail lost its head).
    # Timing methodology, query set and the contract keys are
    # unchanged — only where the extras are written. The sidecar write
    # must never break the bench line.
    try:
        with open(DETAILS_PATH, "w") as fh:
            json.dump(
                {"duckdb": duck_timings, "warmup": warmed, "cold": cold}, fh
            )
    except OSError:
        pass
    print(json.dumps(out))


def duckdb_anchor(sf_dir: str) -> dict[str, float]:
    """Wall time of each headline oracle SQL on DuckDB (all cores) over
    the same parquet files — a real engine-external baseline at the
    same data scale, single-node vs single-node."""
    import duckdb

    from rag_lakehouse_spark.plans import registry
    from rag_lakehouse_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    oracles = registry.oracle_sql()
    out: dict[str, float] = {}
    for name in HEADLINE:
        sql = oracles.get(name)
        if not sql:
            continue
        # One warm run (symmetric with the Spark warmup), then a timed run.
        # If the warm run already took >5 s, record it directly: warm-vs-cold
        # skew only matters at sub-second scale, and re-running a minute-long
        # oracle (dedup_ngram_jaccard: ~67 s) doubles the bench for nothing.
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        warm = time.perf_counter() - t0
        if warm > 5.0:
            out[name] = round(warm, 3)
            continue
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


if __name__ == "__main__":
    main()
