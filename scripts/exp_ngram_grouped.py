#!/usr/bin/env python3
"""r16 experiment: BOUNDED grouped-pairs rewrite of dedup_ngram_jaccard
(VERDICT r15 #9). r15's grouped rewrite was rejected because its
collect_list ran on UNCAPPED shingle groups (OOM shape on hot
shingles). This variant keeps the window DF-cap (count over the
shingle partition, filter df <= 100) and only THEN collects — the
buffer is provably <= 100 structs — replacing the sort-merge self-join
with an in-group pair expansion.

Usage:
  python3 scripts/exp_ngram_grouped.py diff   # bit-identity at 3 SFs
  python3 scripts/exp_ngram_grouped.py time   # A/B at sf0.1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F


def grouped_pairs(spark, sf_dir):
    from rag_lakehouse_spark.functions import text as TX
    from rag_lakehouse_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    arr = TX.shingle_relation(d, "text", "doc_id", 8)
    sh = arr.select(
        "doc_id", F.size("shingles").alias("n_sh"), F.explode("shingles").alias("shingle")
    )
    shf = sh.withColumn(
        "df", F.count(F.lit(1)).over(W.partitionBy("shingle"))
    ).filter(F.col("df") <= 100)
    grp = shf.groupBy("shingle").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("doc_id"), F.col("n_sh")))
        ).alias("docs")
    )
    pairs_arr = F.flatten(
        F.transform(
            F.col("docs"),
            lambda x, i: F.transform(
                F.slice(F.col("docs"), i + F.lit(2), F.size(F.col("docs"))),
                lambda y: F.struct(
                    x["doc_id"].alias("doc_a"),
                    y["doc_id"].alias("doc_b"),
                    x["n_sh"].alias("n_sh_a"),
                    y["n_sh"].alias("n_sh_b"),
                ),
            ),
        )
    )
    pairs = (
        grp.select(F.explode(pairs_arr).alias("p"))
        .select("p.doc_a", "p.doc_b", "p.n_sh_a", "p.n_sh_b")
        .groupBy("doc_a", "doc_b", "n_sh_a", "n_sh_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n_sh_a") + F.col("n_sh_b") - F.col("n_common")
    )
    return pairs.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= 0.5
    )


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "diff"
    from rag_lakehouse_spark.plans.registry import queries
    from rag_lakehouse_spark.session import get_spark

    spark = get_spark("exp_ngram")
    cur = queries()["dedup_ngram_jaccard"]

    if mode == "diff":
        for sf in ("sf0.001", "sf0.01", "sf0.1"):
            sf_dir = f"/root/testdata/{sf}"
            old = sorted(map(tuple, cur(spark, sf_dir).collect()))
            new = sorted(map(tuple, grouped_pairs(spark, sf_dir).collect()))
            assert old == new, f"{sf}: MISMATCH {len(old)} vs {len(new)}"
            print(f"{sf}: identical {len(old)} pairs")
    elif mode == "time":
        sf_dir = "/root/testdata/sf0.1"
        for fn in (lambda: cur(spark, "/root/testdata/sf0.001"),
                   lambda: grouped_pairs(spark, "/root/testdata/sf0.001")):
            fn().write.format("noop").mode("overwrite").save()
        for name, fn in (
            ("current_selfjoin", lambda: cur(spark, sf_dir)),
            ("grouped_bounded", lambda: grouped_pairs(spark, sf_dir)),
        ):
            runs = []
            for _ in range(3):
                spark.sparkContext.setJobDescription(f"exp:{name}")
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 3))
            print(name, sorted(runs))


if __name__ == "__main__":
    main()
