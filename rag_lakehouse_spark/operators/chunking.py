"""Document chunking operators (reference jobs/embedder.py:40-41,61-87:
SemanticChunker → chunk records with ``{id}_chunk_{i}`` ids).

Three variants, in preference order for a 100 TB corpus:

1. ``chunk_fixed`` — deterministic fixed-size windows, pure expression
   (sequence → transform → explode), zero Python. The testable default.
2. ``chunk_sentences`` — sentence-boundary splits packed into ~size
   chars, still expression-only.
3. ``chunk_semantic`` — embedding-breakpoint chunking (the reference's
   LangChain SemanticChunker semantics) as an Arrow-batched pandas UDF
   over a pluggable embedder; Python, so the slow path — use when
   chunk quality matters more than throughput.

All are flatMap-shaped: no shuffle, scale linearly with executors.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# The exact Unicode White_Space set — what Java's (?U)\s (used by
# chunk_sentences' keep-filter) matches. Python's bare str.strip() is
# NOT this set: it also strips U+001C..U+001F (file/group/record/unit
# separators, isspace() in Python but not White_Space in Unicode), so a
# sentence of only '\x1c' would be kept by the Spark chunker and
# dropped by a bare-.strip() Python twin. Every Python-side emptiness
# check in this module must use s.strip(WHITE_SPACE) — same latent
# class as the TX.WS "never bare \s" rule.
WHITE_SPACE = (
    "\t\n\x0b\f\r \x85\xa0\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a"
    "\u2028\u2029\u202f\u205f\u3000"
)


def _chunk_array_fixed(text: Column, size: int) -> Column:
    """array<string> of fixed-size windows; 1-based substring positions
    (empty text still yields one empty chunk, mirroring the oracle's
    ``greatest(length,1)`` guard)."""
    n_chunks_minus1 = (F.greatest(F.length(text), F.lit(1)) - 1).cast("int") / F.lit(size)
    return F.transform(
        F.sequence(F.lit(0), F.floor(n_chunks_minus1).cast("int")),
        lambda i: F.substring(text, i * size + 1, F.lit(size)),
    )


def chunk_fixed(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 200,
    id_prefix: str = "doc",
) -> DataFrame:
    """1 doc → N chunk rows: (id, chunk_number 1-based, chunk_id,
    chunk_text). posexplode supplies chunk_number; chunk ids follow the
    reference's ``{prefix}_{id}_chunk_{i}`` scheme."""
    exploded = df.select(
        F.col(id_col),
        F.posexplode(_chunk_array_fixed(F.col(text_col), size)).alias("pos", "chunk_text"),
    )
    return exploded.select(
        F.col(id_col),
        (F.col("pos") + 1).alias("chunk_number"),
        F.concat_ws(
            "_", F.lit(id_prefix), F.col(id_col).cast("string"), F.lit("chunk"), F.col("pos")
        ).alias("chunk_id"),
        "chunk_text",
    )


def chunk_sentences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_chars: int = 400,
) -> DataFrame:
    """Sentence-boundary chunking, expression-only: split on
    [.!?]+whitespace, then greedily pack consecutive sentences into
    chunks of ≤ max_chars via a running-length fold. Sentences with no
    non-whitespace content are dropped — under UNICODE whitespace
    ((?U)\\S), not Spark's ASCII-space trim(): a sentence of only
    U+00A0 is empty, so every emitted chunk has real content.

    The boundary split uses the EXPLICIT ASCII whitespace class (the
    functions.text.WS convention), not ``\\s``: Java's \\s is ASCII
    while Python's (used by ``chunk_semantic``'s worker-side splitter)
    is Unicode-aware, so a bare ``\\s`` would make the two chunkers
    disagree on e.g. ``"Dot.\\u00a0Next"`` — same divergence class the
    generated-corpus fuzz caught between Java and RE2."""
    sents = F.filter(
        F.split(F.col(text_col), r"(?<=[.!?])[ \t\n\x0B\f\r]+"),
        lambda s: s.rlike(r"(?U)\S"),
    )
    # Greedy packing with aggregate: state = array of chunks; append the
    # sentence to the last chunk if it fits, else start a new chunk.
    packed = F.aggregate(
        sents,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(F.size(acc) == 0, F.array(s)).otherwise(
            F.when(
                F.length(F.element_at(acc, -1)) + F.length(s) + 1 <= max_chars,
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.concat_ws(" ", F.element_at(acc, -1), s)),
                ),
            ).otherwise(F.concat(acc, F.array(s)))
        ),
    )
    exploded = df.select(F.col(id_col), F.posexplode(packed).alias("pos", "chunk_text"))
    return exploded.select(
        F.col(id_col), (F.col("pos") + 1).alias("chunk_number"), "chunk_text"
    )


def chunk_semantic(
    df: DataFrame,
    embed_fn: Callable[[list[str]], "np.ndarray"] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    percentile: float = 90.0,
) -> DataFrame:
    """Semantic-breakpoint chunking (reference jobs/embedder.py:40-41
    semantics): split into sentences, embed each, break where the
    cosine distance between consecutive sentence embeddings exceeds the
    given percentile of all gaps in the document.

    ``embed_fn`` maps list[str] → (n, dim) array; defaults to the
    deterministic pseudo-embedder (operators.embedding) so the operator
    is testable without model weights. Runs as mapInPandas — Arrow
    batches, model loaded once per executor, never ``collect()``.
    """
    if embed_fn is None:
        from rag_lakehouse_spark.operators.embedding import pseudo_embed_texts

        embed_fn = pseudo_embed_texts

    import re

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("chunk_number", T.IntegerType()),
            T.StructField("chunk_text", T.StringType()),
        ]
    )

    def split_batches(batches):
        for pdf in batches:
            rows: list[tuple] = []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                # Explicit ASCII boundary class — keeps this Python-side
                # splitter identical to chunk_sentences' Java regex
                # (Python \s is Unicode-aware, Java's is ASCII).
                sents = [
                    s
                    for s in re.split(r"(?<=[.!?])[ \t\n\x0B\f\r]+", text or "")
                    if s.strip(WHITE_SPACE)
                ]
                if len(sents) <= 1:
                    rows.append((rid, 1, text or ""))
                    continue
                emb = embed_fn(sents)
                emb = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-12)
                gaps = 1.0 - (emb[:-1] * emb[1:]).sum(axis=1)
                cut = np.percentile(gaps, percentile)
                chunks: list[list[str]] = [[sents[0]]]
                for s, g in zip(sents[1:], gaps):
                    if g > cut:
                        chunks.append([s])
                    else:
                        chunks[-1].append(s)
                rows.extend((rid, i + 1, " ".join(c)) for i, c in enumerate(chunks))
            yield pd.DataFrame(rows, columns=[id_col, "chunk_number", "chunk_text"])

    return df.select(id_col, text_col).mapInPandas(split_batches, out_schema)


def chunk_sliding(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 200,
    stride: int = 100,
    id_prefix: str = "doc",
) -> DataFrame:
    """Overlapping sliding-window chunks: windows of ``size`` chars
    starting every ``stride`` chars (stride < size ⇒ consecutive
    chunks overlap by size - stride). The standard embedding-context
    windowing when boundary-truncation loss matters more than the
    duplicated characters; stride == size degenerates to chunk_fixed.
    Window starts cover every char: the last window begins at the
    greatest stride multiple below the text length (empty text still
    yields one empty chunk). Pure flatMap — no shuffle."""
    text = F.col(text_col)
    n_minus1 = (F.greatest(F.length(text), F.lit(1)) - 1).cast("int") / F.lit(stride)
    windows = F.transform(
        F.sequence(F.lit(0), F.floor(n_minus1).cast("int")),
        lambda i: F.substring(text, i * stride + 1, F.lit(size)),
    )
    exploded = df.select(
        F.col(id_col), F.posexplode(windows).alias("pos", "chunk_text")
    )
    return exploded.select(
        F.col(id_col),
        (F.col("pos") + 1).alias("chunk_number"),
        F.concat_ws(
            "_", F.lit(id_prefix), F.col(id_col).cast("string"), F.lit("chunk"), F.col("pos")
        ).alias("chunk_id"),
        "chunk_text",
    )
