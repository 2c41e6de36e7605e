#!/usr/bin/env python3
"""r16 experiment: Arrow-native partial-min fold for the MinHash
signature kernel (VERDICT r15 #3) — numpy does the 64 affine
transforms + per-doc mins per partition (vectorized, SIMD), Spark's
final agg merges the per-task partials. Differential-checked against
the shipped JVM 64-min-agg path before any swap.

Usage:
  python3 scripts/exp_minhash_kernel.py diff   # bit-identity at 3 SFs
  python3 scripts/exp_minhash_kernel.py time   # A/B at sf0.1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

NUM_HASHES = 64


def signatures_pandas(rows, id_col: str, num_hashes: int = NUM_HASHES):
    """(id, __h) hash rows -> (id, signature) via mapInPandas partial
    fold + final min-agg merge. Must be bit-identical to
    operators.dedup._signatures_from_hash_rows."""
    import numpy as np
    import pandas as pd

    rng_a = [(2 * i + 1) * 0x9E3779B97F4A7C15 & (2**64 - 1) for i in range(num_hashes)]
    rng_b = [(i * 0xC2B2AE3D27D4EB4F + 0x165667B19E3779F9) & (2**64 - 1) for i in range(num_hashes)]
    A = __import__("numpy").array(rng_a, dtype="uint64")[:, None]
    B = __import__("numpy").array(rng_b, dtype="uint64")[:, None]

    id_type = [f for f in rows.schema.fields if f.name == id_col][0].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, " + ", ".join(
        f"__m{i} bigint" for i in range(num_hashes)
    )

    def fold(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            ids = pdf[id_col].to_numpy()
            h = pdf["__h"].to_numpy().astype("int64", copy=False).view(np.uint64)
            starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
            m = (h[None, :] * A + B).view(np.int64)  # (64, n) wraparound
            mins = np.minimum.reduceat(m, starts, axis=1)  # (64, runs)
            out = pd.DataFrame({id_col: ids[starts]})
            for i in range(num_hashes):
                out[f"__m{i}"] = mins[i]
            yield out

    partials = rows.mapInPandas(fold, out_schema)
    inner = ", ".join(f"min(__m{i}) AS __m{i}" for i in range(num_hashes))
    mins = partials.groupBy(id_col).agg(F.expr(f"struct({inner})").alias("__w"))
    sig = ", ".join(f"__w.__m{i}" for i in range(num_hashes))
    return mins.select(F.col(id_col), F.expr(f"array({sig})").alias("signature"))


def hash_rows(spark, sf_dir, shingle_k=8):
    from rag_lakehouse_spark.functions.text import normalized_relation
    from rag_lakehouse_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    norm_df = normalized_relation(d, "text", "doc_id")
    n_pos = F.length("__norm") - (shingle_k - 1)
    return norm_df.filter(F.length("__norm") >= shingle_k).select(
        F.col("doc_id"),
        F.explode(F.sequence(F.lit(1), n_pos)).alias("__pos"),
        F.col("__norm"),
    ).select(
        F.col("doc_id"),
        F.xxhash64(F.expr(f"substring(__norm, __pos, {int(shingle_k)})")).alias("__h"),
    )


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "diff"
    from rag_lakehouse_spark.operators.dedup import _signatures_from_hash_rows
    from rag_lakehouse_spark.session import get_spark

    spark = get_spark("exp_minhash")

    if mode == "diff":
        for sf in ("sf0.001", "sf0.01", "sf0.1"):
            sf_dir = f"/root/testdata/{sf}"
            rows = hash_rows(spark, sf_dir)
            old = {
                r["doc_id"]: tuple(r["signature"])
                for r in _signatures_from_hash_rows(rows, "doc_id", NUM_HASHES).collect()
            }
            new = {
                r["doc_id"]: tuple(r["signature"])
                for r in signatures_pandas(hash_rows(spark, sf_dir), "doc_id").collect()
            }
            assert old == new, f"{sf}: MISMATCH ids={len(set(old) ^ set(new))} " + str(
                [k for k in list(old)[:3]]
            )
            print(f"{sf}: identical signatures for {len(old)} docs")
    elif mode == "time":
        sf_dir = "/root/testdata/sf0.1"
        # warm both paths (JIT + python workers) at sf0.001
        for fn in (
            lambda: _signatures_from_hash_rows(hash_rows(spark, "/root/testdata/sf0.001"), "doc_id", NUM_HASHES),
            lambda: signatures_pandas(hash_rows(spark, "/root/testdata/sf0.001"), "doc_id"),
        ):
            fn().write.format("noop").mode("overwrite").save()
        for name, fn in (
            ("rows_only(explode+hash)", lambda: hash_rows(spark, sf_dir)),
            ("jvm_64min", lambda: _signatures_from_hash_rows(hash_rows(spark, sf_dir), "doc_id", NUM_HASHES)),
            ("pandas_fold", lambda: signatures_pandas(hash_rows(spark, sf_dir), "doc_id")),
        ):
            runs = []
            for _ in range(3):
                spark.sparkContext.setJobDescription(f"exp:{name}")
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 3))
            print(name, sorted(runs))
        n = hash_rows(spark, sf_dir).count()
        print("hash rows at sf0.1:", n)


if __name__ == "__main__":
    main()
