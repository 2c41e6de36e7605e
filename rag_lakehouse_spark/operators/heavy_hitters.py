"""Bounded-memory heavy hitters: Misra-Gries summaries per partition
(mapInPandas, k counters regardless of partition size), merged with
the Agarwal et al. mergeable-summaries rule. The sketch is then used
the way every approximate structure in this repo is used at scale — as
a CANDIDATE FILTER whose output is verified exactly: candidates are
recounted with one semi-join-pruned aggregation, so the final answer
is exact while the full-cardinality groupBy of raw tokens is never
paid above the candidate set.

Guarantee (standard MG): with k counters over n items, every counter
undercounts by at most n/(k+1), and any item with true frequency
> n/(k+1) survives the sketch. The merge (sum counters, decrement by
the (k+1)-th largest, drop non-positive) preserves the same bound, so
a threshold phi > n/(k+1) can never lose a phi-heavy item.

Scale: state is k counters per partition; the driver merge handles
k x P rows (bounded by contract — thousands, not data-sized). At
extreme P, merge in a tree via a second mapInPandas over
repartitioned summaries; the rule is associative.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_update(counters: dict[str, int], item: str, k: int) -> None:
    if item in counters:
        counters[item] += 1
    elif len(counters) < k:
        counters[item] = 1
    else:
        dead = [key for key in counters if counters[key] == 1]
        for key in counters:
            counters[key] -= 1
        for key in dead:
            del counters[key]


def partition_summaries(df: DataFrame, col: str, k: int) -> DataFrame:
    """One Misra-Gries summary (≤ k rows of (item, est)) per partition.

    Vectorized (r15, guide §4.2): each Arrow batch is counted exactly
    with ``value_counts`` (C loop); batch counts accumulate in a
    bounded pending buffer and fold into the running summary with the
    associative MG merge (concat → groupby-sum → subtract the (k+1)-th
    largest → drop non-positive). An exact count is itself a valid MG
    summary and every trim removes ≥ (k+1)·cut of stream mass, so
    Σcut ≤ n/(k+1) — the same undercount bound as the old per-item
    ``_mg_update`` loop (which spent ~1 µs of interpreted Python per
    TOKEN; the fold is now all C-level pandas whatever the stream
    length). Memory stays bounded: k running counters + ≤ 64k pending
    batch-vocabulary entries."""

    def fold(counters: pd.Series | None, pend: list[pd.Series]) -> pd.Series:
        parts = ([counters] if counters is not None else []) + pend
        s = pd.concat(parts).groupby(level=0).sum() if parts else pd.Series(dtype="int64")
        if len(s) > k:
            cut = s.nlargest(k + 1).iloc[-1]
            s = s - cut
            s = s[s > 0]
        return s

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: pd.Series | None = None
        pend: list[pd.Series] = []
        pend_rows = 0
        for pdf in batches:
            vc = pdf[col].dropna().value_counts()
            pend.append(vc)
            pend_rows += len(vc)
            if pend_rows >= 65536:  # bounded pending buffer, then trim
                counters = fold(counters, pend)
                pend, pend_rows = [], 0
        counters = fold(counters, pend)
        yield pd.DataFrame(
            {"item": counters.index.astype(object), "est": counters.to_numpy("int64")}
        )

    return df.select(F.col(col).alias(col)).mapInPandas(
        sketch, schema="item string, est bigint"
    )


def merge_summaries(rows: list[tuple[str, int]], k: int) -> dict[str, int]:
    """Associative merge: sum per item, subtract the (k+1)-th largest
    total, drop non-positive — the result is again a valid k-counter
    MG summary of the union."""
    merged: dict[str, int] = {}
    for item, est in rows:
        merged[item] = merged.get(item, 0) + int(est)
    if len(merged) > k:
        cut = sorted(merged.values(), reverse=True)[k]
        merged = {i: c - cut for i, c in merged.items() if c - cut > 0}
    return merged


def heavy_hitters_exact(
    df: DataFrame, col: str, k: int, ratio_den: int, total: DataFrame | None = None
) -> DataFrame:
    """Exact items with frequency ≥ n/ratio_den, found sketch-first:
    MG candidates (complete by the guarantee, since ratio_den < k+1 is
    required) → exact recount restricted to candidates → integer
    threshold compare (cnt * ratio_den ≥ n, no doubles). Returns
    (item, cnt).

    ``total``: optional single-row (n bigint) DataFrame carrying the
    stream length. When a caller already holds n from another pass
    (e.g. the CMS sketch's row sums, ``corpus_countmin_portable``),
    passing it here removes one full scan of ``df``."""
    if ratio_den >= k + 1:
        raise ValueError(
            f"threshold 1/{ratio_den} is below the sketch guarantee "
            f"1/{k + 1}; raise k or lower ratio_den"
        )
    summaries = partition_summaries(df, col, k).collect()
    candidates = list(
        merge_summaries([(r["item"], r["est"]) for r in summaries], k)
    )
    spark = df.sparkSession
    if not candidates:
        return spark.createDataFrame([], "item string, cnt bigint")
    cand_df = F.broadcast(
        spark.createDataFrame([(c,) for c in candidates], "item string")
    )
    counted = (
        df.select(F.col(col).alias("item"))
        .join(cand_df, "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    if total is None:
        total = df.select(F.count(col).alias("n"))
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * F.lit(ratio_den) >= F.col("n"))
        .select("item", "cnt")
    )
