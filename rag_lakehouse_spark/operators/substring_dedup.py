"""Exact-substring (k-token window) deduplication — the span-level
dedup family from "Deduplicating Training Data Makes Language Models
Better" (Lee et al. 2021, arXiv 2107.06499): find token spans that
occur more than once ANYWHERE in the corpus and strip every occurrence
except the first, instead of dropping whole documents.

Document-level dedup (exact / MinHash / SimHash, ``operators.dedup``)
misses boilerplate repeated INSIDE otherwise-distinct documents —
headers, license blocks, templated paragraphs. This operator works at
window granularity:

1. ``token_windows``: every k-token sliding window per document, keyed
   by a portable 60-bit hash of the window text
   (``dedup_portable.base60`` — same hex-md5 family the portable
   MinHash twins use, so DuckDB reproduces it bit-for-bit).
2. An occurrence is a DUPLICATE iff its window hash occurs > 1 time
   globally and it is not the lexicographically-first (doc_id, pos)
   occurrence (the "first occurrence keeps" rule).
3. ``dup_span_stats``: per-document duplicated-window fraction — the
   corpus-health signal.
4. ``strip_duplicate_spans``: reconstruct each document with every
   token covered by a non-owned duplicate window removed — the actual
   cleaning transform.

Scale notes (100 TB): window construction is one codegen pass per doc
(a single ``transform`` lambda over positions — never stacked HOFs, per
the MinHash lesson in operators/dedup.py); the only shuffles are the
groupBy on the 60-bit window hash (uniform by construction) and the
per-doc reassembly groupBy. Nothing is ever all-pairs. Window strings
here are hashed via md5 so the DuckDB oracle is exact; a
throughput-tuned variant would swap in the rolling polynomial hash
(``plans/text_queries.text_rolling_hash``) to avoid materializing
O(n·k) window characters — hash choice is a one-line seam
(``hash_fn``), the plan shape is identical.

Reference parity: the reference dedups whole documents by content hash
only (jobs/silver_transformation.py); span-level dedup is part of this
repo's training-data surface (SURVEY.md §2 extension).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rag_lakehouse_spark.functions.text import WS, edge_trim
from rag_lakehouse_spark.operators.dedup_portable import base60

DEFAULT_K = 15  # tokens per window (synthetic docs average ~54 tokens;
# Lee et al. use 50 for web-scale text — the dial is data-dependent)


def _tokens(text_col: str) -> Column:
    """The shared dedup token contract (simhash/BM25): whitespace split
    of the lowercased trimmed text, NULL → single empty token."""
    return F.split(edge_trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), WS)


def token_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
    hash_fn: Callable[[Column], Column] = base60,
) -> DataFrame:
    """(id, pos, whash): every k-token sliding window, 1-based ``pos``,
    hashed with ``hash_fn``. Documents shorter than k tokens emit no
    windows (both engines agree — the sequence guard mirrors
    functions.text.char_shingles)."""
    toks = (
        df.select(F.col(id_col), _tokens(text_col).alias("__toks"))
        .withColumn("__n", F.size("__toks"))
        .filter(F.col("__n") >= k)
    )
    wins = toks.select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                f"transform(sequence(1, __n - {k - 1}), "
                f"i -> concat_ws(' ', slice(__toks, i, {k})))"
            )
        ).alias("__p0", "__w"),
    )
    return wins.select(
        F.col(id_col),
        (F.col("__p0") + 1).alias("pos"),
        hash_fn(F.col("__w")).alias("whash"),
    )


def duplicate_windows(
    wins: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, pos) of every NON-OWNED occurrence of a globally-duplicated
    window. Owner = lexicographically-first (id, pos) per hash,
    resolved in ONE aggregate as ``min(struct(id, pos))`` — struct min
    is field-wise lexicographic, exactly the two-step (min id, then min
    pos within that id) rule. r15: the old two-aggregate form paid an
    extra join + groupBy pass over the window index per call (kept as
    plain SQL in the DuckDB oracles, which compare OUTPUT rows, not
    plan shape).

    ``wins`` MUST already be materialized (localCheckpoint) by the
    caller — it is consumed twice below (occ, final join), and callers
    typically hold further references; one barrier at the call site
    covers all consumers (docs/SCALE.md self-join rule).
    """
    occ = wins.groupBy("whash").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))).alias(
            "__own"
        ),
    )
    return (
        wins.join(occ, "whash")
        .filter(
            (F.col("cnt") > 1)
            & ~(
                (F.col(id_col) == F.col("__own.d"))
                & (F.col("pos") == F.col("__own.p"))
            )
        )
        .select(F.col(id_col), F.col("pos"))
    )


def dup_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
) -> DataFrame:
    """(id, n_windows, n_dup_windows, dup_fraction) per document —
    every doc appears; short docs report zeros."""
    wins = token_windows(df, text_col, id_col, k).localCheckpoint(eager=True)
    dups = duplicate_windows(wins, id_col)
    wstats = wins.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_windows"))
    dstats = dups.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_dup_windows"))
    base = df.select(id_col).join(wstats, id_col, "left").join(dstats, id_col, "left")
    n_win = F.coalesce(F.col("n_windows"), F.lit(0))
    n_dup = F.coalesce(F.col("n_dup_windows"), F.lit(0))
    return base.select(
        F.col(id_col),
        n_win.alias("n_windows"),
        n_dup.alias("n_dup_windows"),
        F.when(n_win == 0, F.lit(0.0))
        .otherwise(n_dup.cast("double") / n_win)
        .alias("dup_fraction"),
    )


def strip_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
) -> DataFrame:
    """(id, n_tokens, n_removed, text_clean): each document with every
    token covered by a non-owned duplicate window removed, remaining
    tokens rejoined with single spaces in original order.

    A token at position p is covered by window (pos) iff
    pos ≤ p ≤ pos+k-1; covered positions come from exploding each
    duplicate window's range — O(dup_windows × k) rows, deduplicated
    per (doc, position) before the anti-join against the token relation.
    """
    wins = token_windows(df, text_col, id_col, k).localCheckpoint(eager=True)
    covered = (
        duplicate_windows(wins, id_col)
        .select(
            F.col(id_col),
            F.explode(F.expr(f"sequence(pos, pos + {k - 1})")).alias("tpos"),
        )
        .distinct()
    )
    toks = df.select(
        F.col(id_col), F.posexplode(_tokens(text_col)).alias("__p0", "tok")
    ).select(F.col(id_col), (F.col("__p0") + 1).alias("tpos"), F.col("tok"))
    kept = toks.join(covered, [id_col, "tpos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("tpos").alias("p"), F.col("tok")))
                ),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("text_clean"),
    )
    lens = df.select(F.col(id_col), F.size(_tokens(text_col)).alias("n_tokens"))
    out = lens.join(rebuilt, id_col, "left")
    n_kept = F.coalesce(F.col("n_kept"), F.lit(0))
    return out.select(
        F.col(id_col),
        F.col("n_tokens"),
        (F.col("n_tokens") - n_kept).alias("n_removed"),
        F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
    )
