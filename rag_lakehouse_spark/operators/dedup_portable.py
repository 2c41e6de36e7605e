"""Cross-engine-portable probabilistic dedup twins.

The throughput dedup pipeline (``operators.dedup``) hashes with seeded
``xxhash64`` — Catalyst-native and fast, but with no DuckDB equivalent,
so its registry rows can only be rows-only checks. This module
re-expresses the SAME pipeline shapes over a portable hash that DuckDB
reproduces bit-for-bit:

    base60(s)   = int64 of the first 15 hex chars of md5(s)   (60 bits)
    affine_i(h) = (a_i * h + b_i) mod 2^60                     (per seed)

so MinHash-LSH banding + exact-Jaccard verification and SimHash vote
aggregation get full external value-hash verification (driver oracle +
tests/test_oracle.py), not just row counts. The affine family mirrors
the one-permutation construction the xxhash64 path uses
(``dedup._signatures_from_hash_rows``); the multiply is decomposed into
30-bit halves so every intermediate stays below 2^62 — no int64
overflow, hence identical results under Spark ANSI mode and DuckDB.

Shapes deliberately match ``operators.dedup`` (the measured-at-sf0.1
formulations): explode → primitive agg buffers (never stacked
higher-order folds), a materialization barrier before every self-join
over a derived table, and exact verification only on semi-join-pruned
candidates. The xxhash64 pipeline remains the benchmarked throughput
path; these twins exist to prove the machinery against an independent
engine.

Reference parity: the reference dedups by exact doc hash only
(``jobs/silver_transformation.py``); probabilistic near-dup is part of
this repo's training-data-pipeline surface (SURVEY.md §2 extension).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rag_lakehouse_spark.functions.text import WS, edge_trim, normalized_relation
from rag_lakehouse_spark.functions.util import fan_out
from rag_lakehouse_spark.operators.dedup import exact_jaccard_verify

_M30 = (1 << 30) - 1
_P30 = 1 << 30
_P60 = 1 << 60

# 24 hashes × 8 bands × 3 rows/band: the LSH S-curve crosses ~50%
# recall at J ≈ (1/8)^(1/3) ≈ 0.5 — the same threshold the 64×16×4
# xxhash64 pipeline is tuned to.
NUM_HASHES = 24
BANDS = 8
ROWS_PER_BAND = NUM_HASHES // BANDS

SIMHASH_BITS = 60  # base60 yields 60 deterministic bits
SIMHASH_BLOCKS = 4  # 15-bit pigeonhole segments → catches hamming ≤ 3


def _perm_params(i: int) -> tuple[int, int]:
    """Deterministic (a_i, b_i) for the affine family: a odd in
    [1, 2^30), b in [0, 2^60) — derived from md5 so the constants are
    reproducible from the seed index alone (no RNG state)."""
    d = hashlib.md5(f"perm:{i}".encode()).digest()
    a = (int.from_bytes(d[:4], "big") & _M30) | 1
    b = int.from_bytes(d[4:12], "big") % _P60
    return a, b


_PARAMS = [_perm_params(i) for i in range(NUM_HASHES)]


def base60(col: Column) -> Column:
    """Portable 60-bit hash: first 15 hex chars of md5 as int64.
    DuckDB twin: ``duckdb_base60``. 15 (not 16) chars so the value is
    always positive and fits int64 — sign handling differs between
    engines, magnitude does not."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def duckdb_base60(s: str) -> str:
    return f"(('0x' || substr(md5({s}), 1, 15))::BIGINT)"


def affine60(h: Column, a: int, b: int) -> Column:
    """(a*h + b) mod 2^60 without int64 overflow: split h into 30-bit
    halves, reduce the high product mod 2^30 before shifting back.
    Every intermediate < 2^62. DuckDB twin: ``duckdb_affine60``."""
    lo = F.lit(a) * h.bitwiseAND(F.lit(_M30))
    hi = F.shiftleft((F.lit(a) * F.shiftright(h, 30)) % F.lit(_P30), 30)
    return (lo + hi + F.lit(b)) % F.lit(_P60)


def duckdb_affine60(h: str, a: int, b: int) -> str:
    return (
        f"(({a}*({h} & {_M30}) + ((({a}*({h} >> 30)) % {_P30}) << 30) + {b})"
        f" % {_P60})"
    )


def spark_affine60_sql(h: str, a: int, b: int) -> str:
    """Spark-SQL text of ``affine60`` (identical arithmetic, function
    spellings Spark parses) — used to build wide hash-family plans in
    ONE parser round-trip instead of hundreds of py4j Column calls
    (r15; the construction overhead is pure driver time per fresh
    plan)."""
    return (
        f"(({a}L * ({h} & {_M30}L)"
        f" + shiftleft(({a}L * shiftright({h}, 30)) % {_P30}L, 30)"
        f" + {b}L) % {_P60}L)"
    )


def portable_band_keys(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 8,
) -> DataFrame:
    """(id, band_idx, band_key) LSH postings over the portable hash
    family: positions-explode k-gram shingles → base60 → NUM_HASHES
    affine min-agg buffers → BANDS string band keys. The banding stage
    shared by ``portable_minhash_pairs`` (batch self-join) and the
    streaming postings sink (``streaming.dedup_sink``, which maintains
    these rows as state so signatures are computed once per doc ever).
    Not materialized here — a self-joining consumer must add its own
    barrier (see the self-join materialization rule in docs/SCALE.md)."""
    norm = normalized_relation(df, text_col, id_col)
    n_pos = F.length("__norm") - (shingle_k - 1)
    # MIN is duplicate-insensitive → position substrings (with repeats)
    # yield the same mins as the oracle's distinct shingle set.
    rows = (
        norm.filter(F.length("__norm") >= shingle_k)
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(1), n_pos)).alias("__pos"),
            F.col("__norm"),
        )
        .select(
            F.col(id_col),
            base60(F.expr(f"substring(__norm, __pos, {int(shingle_k)})")).alias("__h"),
        )
    )
    # aggregates and band keys built as SQL strings (one parse each)
    # instead of hundreds of py4j Column calls — ~0.8 s of pure driver
    # construction overhead per fresh plan removed (r15); identical
    # Catalyst expressions either way
    inner = ", ".join(
        f"min({spark_affine60_sql('__h', *_PARAMS[i])}) AS __m{i}"
        for i in range(NUM_HASHES)
    )
    mins = rows.groupBy(id_col).agg(F.expr(f"struct({inner})").alias("__w"))
    band_keys = ", ".join(
        "concat_ws('|', "
        + ", ".join(
            f"CAST(__w.__m{j * ROWS_PER_BAND + r} AS STRING)"
            for r in range(ROWS_PER_BAND)
        )
        + ")"
        for j in range(BANDS)
    )
    return mins.select(
        F.col(id_col),
        F.expr(f"posexplode(array({band_keys}))").alias("band_idx", "band_key"),
    )


def portable_minhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-dup pairs over the portable hash family:
    band-key postings (``portable_band_keys``) → band equi-join
    candidates → exact Jaccard ≥ threshold. Returns
    (id_a, id_b, jaccard).

    Same plan shape as ``dedup.minhash_lsh_pairs`` (see its docstring
    for why explode→agg beats stacked HOF folds and why candidates are
    checkpointed); only the hash primitive differs.
    """
    banded = portable_band_keys(df, text_col, id_col, shingle_k).localCheckpoint(
        eager=True
    )  # barrier: both self-join sides read it
    return pairs_from_band_keys(df, banded, text_col, id_col, shingle_k, threshold)


def pairs_from_band_keys(
    df: DataFrame,
    banded: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """(id, band_idx, band_key) postings (already materialized — state
    table or checkpoint) → band equi-join candidates → exact Jaccard
    verify against the corpus ``df``. The read side of the streaming
    postings index shares this with the batch pipeline, so maintained
    postings yield bit-identical pairs to the one-shot computation."""
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
        .localCheckpoint(eager=True)  # consumed twice by the verifier
    )
    return exact_jaccard_verify(df, cands, text_col, id_col, shingle_k, threshold)


def _portable_minhash_ctes(table: str, shingle_k: int) -> str:
    """The WITH-body (no leading ``WITH``) replicating
    ``portable_minhash_pairs`` up to a ``verified(id_a, id_b, jaccard)``
    CTE — shared by the pairs oracle and the end-to-end canonicals
    oracle (which appends recursive component CTEs)."""
    from rag_lakehouse_spark.functions.text import duckdb_char_shingles

    min_cols = ",\n             ".join(
        f"MIN({duckdb_affine60('h60', *_PARAMS[i])}) AS m{i}"
        for i in range(NUM_HASHES)
    )
    band_rows = "\n      UNION ALL ".join(
        "SELECT doc_id, {j} AS band_idx, {key} AS band_key FROM mins".format(
            j=j,
            key=" || '|' || ".join(
                f"m{j * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)
            ),
        )
        for j in range(BANDS)
    )
    return f"""sh AS (
      SELECT doc_id, unnest({duckdb_char_shingles('text', shingle_k)}) AS shingle
      FROM {table}
    ),
    hr AS (SELECT doc_id, {duckdb_base60('shingle')} AS h60 FROM sh),
    mins AS (SELECT doc_id,
             {min_cols}
             FROM hr GROUP BY doc_id),
    banded AS (
      {band_rows}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a
      JOIN banded b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                   AND a.doc_id < b.doc_id
    ),
    sized AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS n_common
      FROM cand c
      JOIN sh a ON a.doc_id = c.id_a
      JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
      GROUP BY c.id_a, c.id_b
    ),
    verified AS (
      SELECT id_a, id_b,
             CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
      FROM common
      JOIN sized sa ON sa.doc_id = id_a
      JOIN sized sb ON sb.doc_id = id_b
      WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.5
    )"""


def portable_minhash_oracle(table: str = "documents", shingle_k: int = 8) -> str:
    """DuckDB SQL computing ``portable_minhash_pairs`` bit-for-bit."""
    return f"""
    WITH {_portable_minhash_ctes(table, shingle_k)}
    SELECT id_a, id_b, jaccard FROM verified
    """


def portable_canonicals_oracle(table: str = "documents", shingle_k: int = 8) -> str:
    """DuckDB SQL for the END-TO-END dedup decision over the portable
    MinHash-LSH edge set: verified pairs → connected components
    (recursive reachability fixpoint, min label) → every doc labeled
    (cluster_id, is_canonical), singletons self-canonical — the twin of
    ``clusters.dedup_cluster_canonicals`` over
    ``portable_minhash_pairs`` edges."""
    return f"""
    WITH RECURSIVE {_portable_minhash_ctes(table, shingle_k)},
    edges AS (
      SELECT id_a AS a, id_b AS b FROM verified
      UNION
      SELECT id_b AS a, id_a AS b FROM verified
    ),
    reach AS (
      SELECT a AS node, a AS r FROM edges
      UNION
      SELECT e.b AS node, reach.r AS r FROM reach JOIN edges e ON e.a = reach.node
    ),
    comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
    SELECT d.doc_id,
           COALESCE(component, d.doc_id) AS cluster_id,
           d.doc_id = COALESCE(component, d.doc_id) AS is_canonical
    FROM {table} d LEFT JOIN comp ON comp.node = d.doc_id
    """


def _portable_token_hashes(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(id, base60(token)) rows — whitespace tokens of the lowercased
    trimmed text, NULL → the single empty token (same contract as
    ``dedup.simhash_docs``)."""
    toks = F.split(edge_trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), WS)
    return (
        fan_out(df)
        .select(F.col(id_col), F.explode(toks).alias("__tok"))
        .select(F.col(id_col), base60(F.col("__tok")).alias("__h"))
    )


def portable_simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """60-bit portable SimHash: per bit position, ±1 votes over the
    token base60 hashes, packed into one int64 fingerprint. Same
    explode → conditional-SUM-buffers shape as ``dedup.simhash_docs``
    (64-bit xxhash64 version); unique-``id_col`` contract also
    identical. Returns (id, simhash, n_tokens)."""
    rows = _portable_token_hashes(df, text_col, id_col)
    votes = rows.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        *[
            F.sum(
                F.when(F.shiftright(F.col("__h"), b).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"__v{b}")
            for b in range(SIMHASH_BITS)
        ],
    )
    bit_cols = [
        F.when(F.col(f"__v{b}") > 0, F.lit(1).cast("bigint"))
        .otherwise(F.lit(0).cast("bigint"))
        for b in range(SIMHASH_BITS)
    ]
    fingerprint = bit_cols[0]
    for b in range(1, SIMHASH_BITS):
        fingerprint = fingerprint + F.shiftleft(bit_cols[b], b)
    return votes.select(
        F.col(id_col), fingerprint.alias("simhash"), F.col("n_tokens")
    )


def _duckdb_simhash_cte(table: str) -> str:
    """Shared CTE chain computing (doc_id, simhash, n_tokens) in DuckDB
    — the twin of ``portable_simhash``."""
    vote_cols = ",\n      ".join(
        f"SUM(CASE WHEN (h60 >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END << {b})"
        for b in range(SIMHASH_BITS)
    )
    return f"""
    toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(regexp_replace(lower(coalesce(text, '')), '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'), '[ \t\n\x0B\f\r]+'))
               AS tok
      FROM {table}
    ),
    hr AS (SELECT doc_id, {duckdb_base60('tok')} AS h60 FROM toks),
    votes AS (
      SELECT doc_id, COUNT(*) AS n_tokens,
      {vote_cols}
      FROM hr GROUP BY doc_id
    ),
    fps AS (
      SELECT doc_id, {fp} AS simhash, n_tokens FROM votes
    )"""


def portable_simhash_oracle(table: str = "documents") -> str:
    return f"""
    WITH {_duckdb_simhash_cte(table)}
    SELECT doc_id, simhash, n_tokens FROM fps
    """


def portable_simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Portable SimHash near-pairs: 4 × 15-bit pigeonhole segments
    (any pair within hamming ≤ 3 of 60 bits shares a segment) →
    per-segment equi-join → bit_count(xor) verify. Same shape and
    checkpoint barrier as ``dedup.simhash_near_pairs``. Returns
    (id_a, id_b, hamming)."""
    sh = (
        portable_simhash(df, text_col, id_col)
        .select(F.col(id_col), F.col("simhash"))
        .localCheckpoint(eager=True)
    )
    seg_bits = SIMHASH_BITS // SIMHASH_BLOCKS
    mask = (1 << seg_bits) - 1
    segmented = sh.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), i * seg_bits).bitwiseAND(F.lit(mask))
                    for i in range(SIMHASH_BLOCKS)
                ]
            )
        ).alias("seg_idx", "seg_val"),
    )
    a = segmented.alias("a")
    b = segmented.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.seg_idx") == F.col("b.seg_idx"))
            & (F.col("a.seg_val") == F.col("b.seg_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def portable_simhash_pairs_oracle(table: str = "documents", max_hamming: int = 3) -> str:
    seg_bits = SIMHASH_BITS // SIMHASH_BLOCKS
    mask = (1 << seg_bits) - 1
    segs = "\n      UNION ALL ".join(
        f"SELECT doc_id, simhash, {i} AS seg_idx,"
        f" (simhash >> {i * seg_bits}) & {mask} AS seg_val FROM fps"
        for i in range(SIMHASH_BLOCKS)
    )
    return f"""
    WITH {_duckdb_simhash_cte(table)},
    segmented AS (
      {segs}
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM segmented a
    JOIN segmented b ON a.seg_idx = b.seg_idx AND a.seg_val = b.seg_val
                    AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


def edit_verified_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_edit_pct: int = 10,
) -> DataFrame:
    """SimHash-blocked candidates confirmed by EDIT DISTANCE: segment
    join + hamming verify produce candidates; ``levenshtein`` over the
    NORMALIZED texts (ASCII by construction — byte-based DuckDB and
    codepoint-based Spark levenshtein agree only on ASCII, which the
    shared ``normalized()`` guarantees) keeps pairs whose distance is
    ≤ ``max_edit_pct``% of the shorter text. Integer threshold compare
    (``ed * 100 <= pct * least(len_a, len_b)``), no doubles.

    Scale: the O(len²) DP runs ONLY on hamming-pruned candidates —
    never all pairs; texts join back to candidates by id (two hash
    joins on the tiny pair set)."""
    from rag_lakehouse_spark.functions.text import normalized

    pairs = portable_simhash_pairs(df, text_col, id_col, max_hamming)
    norm = df.select(
        F.col(id_col).alias("__nid"), normalized(F.col(text_col)).alias("__norm")
    )
    a = norm.select(F.col("__nid").alias("id_a"), F.col("__norm").alias("__na"))
    b = norm.select(F.col("__nid").alias("id_b"), F.col("__norm").alias("__nb"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    ed = F.levenshtein(F.col("__na"), F.col("__nb"))
    shorter = F.least(F.length("__na"), F.length("__nb"))
    return (
        joined.select(
            "id_a",
            "id_b",
            "hamming",
            ed.cast("bigint").alias("edit_distance"),
            shorter.cast("bigint").alias("shorter_len"),
        )
        .filter(
            F.col("edit_distance") * F.lit(100)
            <= F.lit(max_edit_pct) * F.col("shorter_len")
        )
    )


def edit_verified_pairs_oracle(
    table: str = "documents", max_hamming: int = 3, max_edit_pct: int = 10
) -> str:
    from rag_lakehouse_spark.functions.text import duckdb_normalized

    pairs = portable_simhash_pairs_oracle(table, max_hamming)
    na = duckdb_normalized("da.text")
    nb = duckdb_normalized("db.text")
    return f"""
    WITH pairs AS ({pairs})
    SELECT * FROM (
      SELECT p.id_a, p.id_b, p.hamming,
             CAST(levenshtein({na}, {nb}) AS BIGINT) AS edit_distance,
             CAST(least(length({na}), length({nb})) AS BIGINT) AS shorter_len
      FROM pairs p
      JOIN {table} da ON da.doc_id = p.id_a
      JOIN {table} db ON db.doc_id = p.id_b
    ) WHERE edit_distance * 100 <= {max_edit_pct} * shorter_len
    """
