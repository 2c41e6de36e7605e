"""Distributed BPE tokenizer training: learn merge rules from a corpus
by iterative pair counting — tokenizer induction IS a corpus-scale
aggregation problem, and the operator a training-data pipeline needs
before it can count tokens with its own vocabulary.

Algorithm (Sennrich et al. 2016, the standard byte-pair encoding
trainer), re-expressed Spark-first:

1. Collapse the corpus to a WORD-FREQUENCY table (the classic scale
   trick: pair statistics only depend on word types x counts, so a
   100 TB corpus shrinks to its vocabulary before any iteration).
2. Each word becomes a symbol array (characters).
3. Per merge round: count adjacent symbol pairs weighted by word
   frequency (slice/zip/explode -> groupBy, map-side combine), pick
   the globally best pair (max count, lexicographic tie-break — a
   1-row collect by contract), and rewrite every word's symbol array
   with one greedy left-to-right ``aggregate`` fold (JVM-side; a
   single non-stacked HOF per round, with an eager localCheckpoint
   per round so plans never nest — the r3 HOF-stacking lesson).

Scale: each round is one explode+groupBy over the vocabulary (not the
corpus) plus a broadcast-scalar rewrite. Driver state is one winning
pair per round. At web scale the vocabulary table is still millions of
rows — far below corpus size and perfectly partitionable; real
tokenizer trainers (HuggingFace, SentencePiece) do the identical
word-count collapse and then iterate on ONE machine, which is the part
that stops scaling — this keeps the iteration distributed.

Verification: rows-only in the registry (the iterative argmax loop has
no SQL twin) + pytest equivalence against a pure-Python reference
trainer on fixtures AND hypothesis-generated corpora
(tests/test_bpe.py).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rag_lakehouse_spark.functions.text import WS, edge_trim


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace tokens of the corpus — the input
    contract of the trainer. One linear explode + one groupBy."""
    return (
        df.select(
            F.explode(
                F.split(edge_trim(F.coalesce(F.col(text_col), F.lit(""))), WS)
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )


def _chars() -> Column:
    # split('') has engine-specific edge behavior; substring transform
    # over an index sequence is explicit and total (applies to `word`)
    return F.expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
    ).alias("syms")


def _pair_counts(words: DataFrame) -> DataFrame:
    n = F.size("syms")
    pairs = F.arrays_zip(
        F.slice("syms", 1, n - 1).alias("l"),
        F.slice("syms", 2, n - 1).alias("r"),
    )
    return (
        words.filter(n >= 2)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("pair_count"))
    )


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of every (left, right) adjacency —
    one aggregate fold, branch chosen per element (CASE evaluates
    lazily, so the slice never sees an empty accumulator)."""
    merged = left + right

    def step(acc: Column, x: Column) -> Column:
        hit = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right))
        )
        return F.when(
            hit,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(syms, F.array().cast("array<string>"), step)


def train_merges(
    words: DataFrame, n_merges: int, min_count: int = 2
) -> list[tuple[int, str, str, int]]:
    """Learn up to ``n_merges`` BPE merge rules from a (word, freq)
    table. Returns [(rank, left, right, pair_count)], stopping early
    when no pair reaches ``min_count``."""
    cur = words.select("word", "freq", _chars()).localCheckpoint(eager=True)
    rules: list[tuple[int, str, str, int]] = []
    try:
        for rank in range(n_merges):
            best = (
                _pair_counts(cur)
                .orderBy(F.desc("pair_count"), F.asc("l"), F.asc("r"))
                .limit(1)
                .collect()
            )
            if not best or best[0]["pair_count"] < min_count:
                break
            l, r, c = best[0]["l"], best[0]["r"], int(best[0]["pair_count"])
            rules.append((rank, l, r, c))
            nxt = cur.select(
                "word", "freq", _apply_merge(F.col("syms"), l, r).alias("syms")
            ).localCheckpoint(eager=True)
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    return rules


def train_merges_reference(
    word_freq: dict[str, int], n_merges: int, min_count: int = 2
) -> list[tuple[int, str, str, int]]:
    """Pure-Python reference trainer (the differential model for
    tests): identical pair statistics, argmax tie-break, and greedy
    merge application."""
    seqs: dict[str, tuple[list[str], int]] = {
        w: (list(w), c) for w, c in word_freq.items() if w
    }
    rules: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for syms, c in seqs.values():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (l, r), c = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if c < min_count:
            break
        rules.append((rank, l, r, c))
        merged = l + r
        for w, (syms, cnt) in seqs.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == l and x == r:
                    out[-1] = merged
                else:
                    out.append(x)
            seqs[w] = (out, cnt)
    return rules


def encode_words(words: DataFrame, rules: list[tuple[int, str, str, int]]) -> DataFrame:
    """(word, n_toks): BPE-encode each DISTINCT word with a learned
    merge table — rules applied in rank order, each greedily
    left-to-right, the EXACT apply semantics of the trainer (so a
    word seen in training collapses to the same symbols training left
    it with).

    Python runs per VOCABULARY ENTRY, not per corpus token — the same
    word-type collapse the trainer exploits. An Arrow-batched
    mapInPandas with the (small, driver-held) merge table in the
    closure; downstream joins fan the counts back out to the corpus.
    """
    order = [(l, r) for _, l, r, _ in sorted(rules)]

    def enc_batches(batches):
        for pdf in batches:
            counts = []
            for w in pdf["word"]:
                syms = list(w)
                for left, right in order:
                    if len(syms) < 2:
                        break
                    out: list[str] = []
                    for x in syms:
                        if out and out[-1] == left and x == right:
                            out[-1] = left + right
                        else:
                            out.append(x)
                    syms = out
                counts.append(len(syms))
            yield pdf.assign(n_toks=counts)[["word", "n_toks"]]

    return words.select("word").mapInPandas(enc_batches, "word string, n_toks int")


def encode_words_stats(
    words: DataFrame, rules: list[tuple[int, str, str, int]]
) -> DataFrame:
    """(word, n_toks, n_merged, merged_chars): per DISTINCT word, the
    encoded symbol count plus MERGE-COVERAGE stats — how many output
    symbols are multi-character (i.e. produced by some merge rule) and
    how many of the word's characters those symbols cover. The
    tokenizer-fit signal per vocabulary entry; same word-type collapse
    and Arrow seam as ``encode_words``."""
    order = [(l, r) for _, l, r, _ in sorted(rules)]

    def enc_batches(batches):
        for pdf in batches:
            n_toks, n_merged, merged_chars = [], [], []
            for w in pdf["word"]:
                syms = list(w)
                for left, right in order:
                    if len(syms) < 2:
                        break
                    out: list[str] = []
                    for x in syms:
                        if out and out[-1] == left and x == right:
                            out[-1] = left + right
                        else:
                            out.append(x)
                    syms = out
                n_toks.append(len(syms))
                merged = [s for s in syms if len(s) > 1]
                n_merged.append(len(merged))
                merged_chars.append(sum(len(s) for s in merged))
            yield pdf.assign(
                n_toks=n_toks, n_merged=n_merged, merged_chars=merged_chars
            )[["word", "n_toks", "n_merged", "merged_chars"]]

    return words.select("word").mapInPandas(
        enc_batches, "word string, n_toks int, n_merged int, merged_chars int"
    )


def encode_word_reference(
    word: str, rules: list[tuple[int, str, str, int]]
) -> list[str]:
    """Pure-Python reference encoder (the differential model for
    tests): identical rank-ordered greedy merge application."""
    syms = list(word)
    for _, left, right, _ in sorted(rules):
        if len(syms) < 2:
            break
        out: list[str] = []
        for x in syms:
            if out and out[-1] == left and x == right:
                out[-1] = left + right
            else:
                out.append(x)
        syms = out
    return syms


def bpe_token_counts(
    df: DataFrame,
    rules: list[tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document token counts under a LEARNED BPE vocabulary:
    (id, n_words, n_word_chars, n_bpe_tokens, chars_per_token) — the
    compression-ratio readout that decides whether a tokenizer fits a
    corpus (and the budget input for sequence packing under the real
    vocabulary rather than the whitespace proxy).

    Scale: corpus → (id, word) explode; the DISTINCT word set is
    encoded ONCE (Python bounded by vocabulary size); an equi-join on
    word fans counts back to the corpus (AQE-skew-safe — stopword-like
    words are hot keys); one per-doc sum. No corpus-sized Python.
    """
    wpd = df.select(
        F.col(id_col),
        F.explode(
            F.split(edge_trim(F.coalesce(F.col(text_col), F.lit(""))), WS)
        ).alias("word"),
    ).filter(F.col("word") != "")
    enc = encode_words(wpd.select("word").distinct(), rules)
    per_doc = (
        wpd.join(enc, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(F.length("word")).cast("bigint").alias("n_word_chars"),
            F.sum("n_toks").cast("bigint").alias("n_bpe_tokens"),
        )
    )
    return df.select(id_col).join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
        F.coalesce("n_word_chars", F.lit(0)).cast("bigint").alias("n_word_chars"),
        F.coalesce("n_bpe_tokens", F.lit(0)).cast("bigint").alias("n_bpe_tokens"),
        F.when(
            F.col("n_bpe_tokens") > 0,
            F.col("n_word_chars").cast("double") / F.col("n_bpe_tokens"),
        ).alias("chars_per_token"),
    )
