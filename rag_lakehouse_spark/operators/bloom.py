"""Portable Bloom filter: the runtime-filter pattern (build a compact
bitmap over the small join side, pre-filter the big side before the
exact join) with every bit externally reproducible.

Spark ships this idea as an internal optimization (runtime bloom
filters under AQE); this operator makes it an EXPLICIT, auditable
operator the way large pipelines deploy it — build once, broadcast the
bitmap, probe map-only — with the bitmap arithmetic frozen to the
portable 60-bit hash family so DuckDB replays every position and the
false-positive accounting is hash-checkable, not estimated.

Layout: ``m_bits`` bits packed 32 per int64 word (bit 31 is the
highest used, so no engine's signed-shift behavior is ever exercised);
``k`` probe positions per key from the TOP 12 bits of k independent
affine transforms of the key's 60-bit hash (top bits depend on every
input bit; low bits of an affine map mod 2^60 would depend only on low
input bits and correlate the probes).

Scale: the build is one groupBy(word).bit_or over k*|keys| position
rows — the shuffle carries at most m_bits/32 words of partial ORs per
task (mergeable, so the same fold serves streaming maintenance); the
collected bitmap is m_bits/8 bytes (512 B at the default 4096 bits —
bounded by the PARAMETER, not the data) and probes as a literal array
with zero shuffle on the big side. False-negative-freedom is a
structural guarantee (OR only sets bits) and is still surfaced as an
exact ``n_missed_members`` column wherever the report runs.

Reference parity: the reference has no sketch layer at all; this is
part of the at-scale join surface beyond it (SURVEY.md §2.6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rag_lakehouse_spark.operators.dedup_portable import (
    affine60,
    base60,
    duckdb_affine60,
    duckdb_base60,
)

# k=4 independent affine transforms (odd multipliers; xxhash/splitmix
# constants). All < 2^32, inside affine60's no-overflow contract.
BLOOM_AB: tuple[tuple[int, int], ...] = (
    (0x9E3779B1, 0x7F4A7C15),
    (0x85EBCA6B, 0xC2B2AE35),
    (0x27D4EB2F, 0x165667B1),
    (0x94D049BB, 0x1F83D9AB),
)

M_BITS = 4096  # 2^12 -> positions are the top 12 of 60 hash bits
_POS_SHIFT = 48  # 60 - 12
N_WORDS = M_BITS // 32

# 32-entry mask LUT: Spark's F.shiftleft takes a LITERAL shift count,
# so the probe looks masks up by bit index instead of shifting by a
# column (same trick as the HLL register arithmetic staying in exprs).
_MASKS = [1 << b for b in range(32)]


def _hash60(key: Column) -> Column:
    return base60(F.concat(F.lit("bloom:"), key.cast("string")))


def _duckdb_hash60(key_sql: str) -> str:
    return duckdb_base60(f"'bloom:' || CAST({key_sql} AS VARCHAR)")


def bloom_positions(key: Column) -> list[Column]:
    """The k bit positions (each in [0, M_BITS)) for one key."""
    h = _hash60(key)
    return [F.shiftright(affine60(h, a, b), _POS_SHIFT) for a, b in BLOOM_AB]


def duckdb_bloom_positions(key_sql: str) -> list[str]:
    h = _duckdb_hash60(key_sql)
    return [f"({duckdb_affine60(h, a, b)} >> {_POS_SHIFT})" for a, b in BLOOM_AB]


def bloom_word_partials(keys: DataFrame, key_col: str) -> DataFrame:
    """(word, w) bit_or partials for a key relation — ONE definition of
    the position->word packing, shared by the batch build (collected
    below) and the streaming fold (``streaming.rollup_sink
    .maintain_bloom_words``): a packing change in two places would let
    the maintained bitmap silently diverge from the batch bitmap and
    void the shared-oracle guarantee. At most N_WORDS rows after the
    map-side partial ORs."""
    # materialize the base hash before the generator: inlined into the
    # explode array it re-evaluates once per affine row (k=4 md5+conv
    # per key instead of 1) — no common-subexpression elimination
    # reaches inside generator arrays (see operators/cms.cms_build)
    h = keys.select(_hash60(F.col(key_col)).alias("__h"))
    pos = h.select(
        F.explode(
            F.array(
                *[
                    F.shiftright(affine60(F.col("__h"), a, b), _POS_SHIFT)
                    for a, b in BLOOM_AB
                ]
            )
        ).alias("pos")
    )
    return (
        pos.select(
            F.shiftright("pos", 5).cast("int").alias("word"),
            F.col("pos").bitwiseAND(F.lit(31)).cast("int").alias("bit"),
        )
        .groupBy("word")
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")
            ).alias("w")
        )
    )


def bloom_build(keys: DataFrame, key_col: str) -> list[int]:
    """Distributed build -> the dense ``N_WORDS``-long word list.
    The collect is the bitmap itself (512 B), never the keys."""
    dense = [0] * N_WORDS
    for r in bloom_word_partials(keys, key_col).collect():
        dense[r["word"]] = r["w"]
    return dense


def bloom_probe(words: list[int], key: Column) -> Column:
    """Boolean membership-test column — pure map-side expression over
    the literal bitmap (no shuffle, no join on the probe side)."""
    if len(words) != N_WORDS:
        raise ValueError(f"bitmap must have {N_WORDS} words")
    warr = F.array(*[F.lit(int(w)).cast("bigint") for w in words])
    marr = F.array(*[F.lit(m).cast("bigint") for m in _MASKS])
    cond = F.lit(True)
    for pos in bloom_positions(key):
        word_val = F.element_at(warr, F.shiftright(pos, 5).cast("int") + 1)
        mask = F.element_at(marr, pos.bitwiseAND(F.lit(31)).cast("int") + 1)
        cond = cond & (word_val.bitwiseAND(mask) != 0)
    return cond


def duckdb_bloom_cte(keys_sql: str, key_sql: str) -> str:
    """CTE text producing ``bloom(words)`` — one row whose ``words`` is
    the same dense word list ``bloom_build`` collects (missing words
    zero-filled via a generate_series spine)."""
    pos = duckdb_bloom_positions("key")  # k aliases the key column to `key`
    sel = " UNION ALL ".join(
        f"SELECT {p} AS pos FROM k" for p in pos
    )
    return f"""
    k AS (SELECT {key_sql} AS key FROM ({keys_sql})),
    bpos AS ({sel}),
    bwords AS (
      SELECT CAST(pos >> 5 AS INT) AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(pos & 31 AS INT)) AS w
      FROM bpos GROUP BY 1
    ),
    bloom AS (
      SELECT list(coalesce(bw.w, 0) ORDER BY gs.g) AS words
      FROM generate_series(0, {N_WORDS - 1}) gs(g)
      LEFT JOIN bwords bw ON bw.word = gs.g
    )"""


def duckdb_bloom_probe(key_sql: str, words_sql: str = "words") -> str:
    """Boolean SQL expression testing ``key_sql`` against the bitmap
    list column (DuckDB shifts by columns natively; lists 1-index)."""
    tests = [
        f"(({words_sql}[CAST(({p} >> 5) AS INT) + 1] >> CAST(({p} & 31) AS INT)) & 1) = 1"
        for p in duckdb_bloom_positions(key_sql)
    ]
    return "(" + " AND ".join(tests) + ")"
