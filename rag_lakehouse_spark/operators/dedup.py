"""Deduplication operators for LLM training-data pipelines.

Exact dedup is a hash-groupBy (see plans.text_queries.dedup_exact_docs);
this module holds the probabilistic family:

- MinHash signatures + LSH banding → candidate pairs → exact-Jaccard
  verification (the web-scale near-dup standard).
- SimHash 64-bit fingerprints (hamming-distance near-dup key).

Everything is Catalyst expressions over seeded ``xxhash64`` — no Python
in the hot path, no mllib dependency (pyspark.ml's MinHashLSH needs a
Vector column and row-at-a-time UDT conversion; building on xxhash64
arrays keeps whole-stage codegen and ~an order of magnitude less data
movement: signatures are 64 longs per doc, shuffled once).

Scale notes: signature computation is map-only. LSH banding explodes to
``bands`` rows/doc (16×), the bucket join shuffles (band, hash) pairs —
at 100 TB that's the by-far cheapest join key available. Exact Jaccard
re-verification touches only candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rag_lakehouse_spark.functions.text import (
    WS,
    edge_trim,
    normalized_relation,
    shingles_from_norm,
)
from rag_lakehouse_spark.functions.util import fan_out as _fan_out


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 8,
) -> DataFrame:
    """Append ``signature: array<bigint>`` — per seed i, the min of
    ``xxhash64(shingle, i)`` over the doc's distinct shingles.

    Row-local (no shuffle): shingling and all `num_hashes` folds happen
    inside one projection; the shingle array is materialized once.
    """
    return df.join(
        minhash_signatures_only(df, text_col, id_col, num_hashes, shingle_k), id_col
    )


def minhash_signatures_only(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 8,
) -> DataFrame:
    """(id, signature) — the shape LSH banding consumes; no join back
    to the source rows (skips a full-table shuffle).

    One base xxhash64 per shingle, then num_hashes affine transforms
    (a_i * h + b_i with 64-bit wraparound) — the "one permutation"
    minwise family. All plain arithmetic → whole-stage codegen, vs.
    num_hashes interpreted higher-order folds over the shingle array
    (~10× slower). Aggregation is groupBy(min×64): partial map-side
    combine means the shuffle carries docs×64 longs, not shingles.
    """
    return signatures_from_norm(
        normalized_relation(df, text_col, id_col), id_col, num_hashes, shingle_k
    )


def signatures_from_norm(
    norm_df: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 8,
) -> DataFrame:
    """(id, signature) straight from the materialized normalized
    string, WITHOUT building the distinct k-gram array: positions
    explode, substrings hash, mins aggregate. MIN is duplicate-
    insensitive, so skipping ``array_distinct`` (a per-row hash set)
    and the array<string> materialization changes nothing semantically
    — signatures are identical to the array path — while removing the
    most allocation-heavy stage of the pipeline. Docs shorter than k
    are filtered out BEFORE the explode (same drop semantics as the
    guarded array path in functions.text.char_shingles): Spark's
    ``sequence(1, 0)`` infers step -1 and yields ``[1, 0]``, so an
    unguarded explode would hand sub-k docs two bogus positions and a
    truncated-substring signature — every empty-normalizing doc would
    then share ``xxhash64('')`` and collide pairwise in LSH banding."""
    n_pos = F.length("__norm") - (shingle_k - 1)
    rows = norm_df.filter(F.length("__norm") >= shingle_k).select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(1), n_pos)).alias("__pos"),
        F.col("__norm"),
    ).select(
        F.col(id_col),
        F.xxhash64(F.expr(f"substring(__norm, __pos, {int(shingle_k)})")).alias("__h"),
    )
    return _signatures_from_hash_rows(rows, id_col, num_hashes)


def signatures_from_shingles(
    sh_df: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_col: str = "shingles",
) -> DataFrame:
    """(id, signature) from an already-materialized (id, shingles)
    relation — the seam that lets one shingle pass feed both the
    signature computation and the exact-Jaccard verification.

    explode → xxhash64 → groupBy(min × num_hashes) is the RIGHT
    formulation, not just the obvious one. The tempting "shuffle-free"
    alternative — hash the array once, then num_hashes ×
    ``array_min(transform(__hs, affine_i))`` in a single projection —
    measures 49.9 s vs 2.3 s (warm, sf0.1, 50 k docs): 64 stacked
    higher-order lambdas in one stage blow past the whole-stage-codegen
    budget into interpreted evaluation, and each ``transform``
    materializes a fresh boxed array per row (64 copies of a ~1 k-long
    array per doc). The explode path keeps every operator primitive
    (generator, hash, min-agg buffers), stays inside codegen, and its
    shuffle carries only docs×num_hashes longs thanks to map-side
    partial mins. Docs with no shingles (shorter than k after
    normalization) yield no exploded rows → no signature → never reach
    banding.
    """
    exploded = (
        sh_df.select(F.col(id_col), F.explode(shingle_col).alias("__sh"))
        .withColumn("__h", F.xxhash64("__sh"))
    )
    return _signatures_from_hash_rows(exploded, id_col, num_hashes)


def _signatures_from_hash_rows(
    rows: DataFrame, id_col: str, num_hashes: int
) -> DataFrame:
    """(id, __h) hash rows → (id, signature): num_hashes affine
    transforms of the base hash, min-aggregated per doc with map-side
    partial combine (the shuffle carries docs×num_hashes longs)."""
    rng_a = [(2 * i + 1) * 0x9E3779B97F4A7C15 & (2**64 - 1) for i in range(num_hashes)]
    rng_b = [(i * 0xC2B2AE3D27D4EB4F + 0x165667B19E3779F9) & (2**64 - 1) for i in range(num_hashes)]

    def _to_i64(v: int) -> int:
        return v - 2**64 if v >= 2**63 else v

    # Expressions are built as SQL strings parsed in ONE round-trip per
    # column (r15): composing them from pyspark Column operators cost
    # ~1.6 s of py4j round-trips per DataFrame CONSTRUCTION (hundreds of
    # JVM calls for 64 aggregates) — pure driver overhead paid on every
    # fresh plan, before a single row moves. Parsed SQL yields the
    # identical Catalyst expression (non-ANSI * and + wrap like Java).
    inner = ", ".join(
        f"min(__h * {_to_i64(rng_a[i])}L + {_to_i64(rng_b[i])}L) AS __m{i}"
        for i in range(num_hashes)
    )
    mins = rows.groupBy(id_col).agg(F.expr(f"struct({inner})").alias("__w"))
    sig = ", ".join(f"__w.__m{i}" for i in range(num_hashes))
    return mins.select(F.col(id_col), F.expr(f"array({sig})").alias("signature"))


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Band the signature (bands × rows-per-band), hash each band, and
    equi-join docs sharing any (band_idx, band_hash) bucket →
    (id_a, id_b) candidate pairs, id_a < id_b, distinct."""
    rows_per_band = num_hashes // bands
    banded = sig_df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band)
                ),
            )
        ).alias("band_idx", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Full near-dup pipeline: MinHash → LSH candidates → exact Jaccard
    (on distinct shingle sets) ≥ threshold. Returns
    (id_a, id_b, jaccard) confirmed pairs.

    With 16 bands × 4 rows the LSH S-curve crosses ~50% recall at
    J≈(1/16)^(1/4)≈0.5 — matched to the default threshold.

    Corpus SHINGLING happens once (the signature pass); the exact-
    Jaccard verification re-normalizes the corpus (a cheap regex scan)
    but shingles only the docs that appear in a candidate pair — at
    scale the candidate set is orders of magnitude smaller than the
    corpus, so the expensive k-gram materialization never runs twice
    over everything. The shingle pass itself puts an exchange between
    the regex and the k-gram lambda (see functions.text
    .normalized_relation for the codegen pathology this avoids).
    Deliberately NOT persisted: caching the wide shingle arrays (or
    even the norm strings) costs more in columnar cache encode/decode
    than the recompute saves, and the bench path runs each query once,
    cold. At true scale the equivalent of the single shingle pass is a
    write-through parquet temp.
    """
    sigs = signatures_from_norm(
        normalized_relation(df, text_col, id_col), id_col, num_hashes, shingle_k
    )
    # Candidate pairs are consumed twice (id extraction + final join):
    # materialize the TINY pair list once so the signature/banding
    # pipeline runs once, not once per consumer. localCheckpoint (eager)
    # rather than persist(): its blocks are owned by the RDD, so the
    # ContextCleaner reclaims them when the result goes out of scope —
    # a plain persist() lives in the CacheManager until an explicit
    # unpersist and would accumulate across calls in a long session.
    cands = lsh_candidate_pairs(sigs, id_col, num_hashes, bands).localCheckpoint(eager=True)
    return exact_jaccard_verify(df, cands, text_col, id_col, shingle_k, threshold)


def exact_jaccard_verify(
    df: DataFrame,
    cands: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact-Jaccard verification of (id_a, id_b) candidate pairs
    against the distinct k-gram sets of the source docs → confirmed
    (id_a, id_b, jaccard ≥ threshold). ``cands`` should already be
    materialized (it is consumed twice: id extraction + final join)."""
    # No .distinct() — a left-semi probe side tolerates duplicate keys,
    # and dropping it saves a whole shuffle stage.
    cand_ids = cands.select(F.explode(F.array("id_a", "id_b")).alias(id_col))
    # Semi-join the RAW docs first, normalize after: the regex pass
    # (the expensive part of re-shingling) runs over only the candidate
    # docs — a vanishing fraction of the corpus at scale — instead of
    # re-normalizing everything and discarding 99% post-join.
    cand_sh = shingles_from_norm(
        normalized_relation(
            df.join(cand_ids, id_col, "left_semi"), text_col, id_col
        ),
        id_col,
        shingle_k,
    )
    a = cand_sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    b = cand_sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    joined = cands.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        joined.select(
            "id_a",
            "id_b",
            (inter.cast("double") / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_docs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """64-bit SimHash: hash each whitespace token once, then for every
    bit position accumulate +1/-1 by bit value over the token hashes;
    the sign vector packs into one bigint fingerprint.

    Near-dups differ in few bits → block/join on rotated prefixes or
    compare via ``bit_count(sh_a ^ sh_b)`` (hamming) on candidates.

    Contract: ``id_col`` must be unique per document — the vote
    aggregation groups by it, so duplicate ids silently merge into one
    combined-vote fingerprint row (one output row per distinct id, not
    per input row). NULL/empty ``text_col`` normalizes to the single
    empty token: such docs get n_tokens=1 and the empty-string-hash
    fingerprint, identical for all of them.

    Shape: tokens EXPLODE to (id, xxhash64(token)) rows, the 64 bit
    votes are 64 conditional-SUM aggregation buffers, and the
    fingerprint packs from the vote columns in a scalar projection —
    the same explode→primitive-agg formulation as the MinHash
    signatures (``_signatures_from_hash_rows``). The alternative (64
    ``F.aggregate`` folds stacked in one projection) is the shape the
    MinHash measurement showed falls out of whole-stage codegen into
    interpreted evaluation (~20× slower); votes-as-agg-buffers keeps
    every operator primitive, and map-side partial combine means the
    shuffle carries docs×64 longs, exactly like MinHash."""
    df = _fan_out(df)
    toks = F.split(edge_trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), WS)
    rows = df.select(F.col(id_col), F.explode(toks).alias("__tok")).select(
        F.col(id_col), F.xxhash64("__tok").alias("__h")
    )
    # The 64 vote aggregates and the 64-term fingerprint packing are
    # built as SQL strings parsed in one round-trip each (r15):
    # composing them from pyspark Column operators cost ~2.2 s of py4j
    # round-trips per DataFrame CONSTRUCTION — driver overhead paid on
    # every fresh plan. Parsed SQL yields identical Catalyst exprs.
    # Bit-test via mask; bit 63 is the sign bit of the i64 hash, so its
    # mask test is simply __h < 0 (avoids the -2^63 literal the SQL
    # parser cannot negate).
    inner = ", ".join(
        (
            f"sum(CASE WHEN (__h & {1 << b}) != 0 THEN 1 ELSE -1 END)"
            if b < 63
            else "sum(CASE WHEN __h < 0 THEN 1 ELSE -1 END)"
        )
        + f" AS __v{b}"
        for b in range(64)
    )
    votes = rows.groupBy(id_col).agg(
        F.expr(f"struct(count(1) AS n_tokens, {inner})").alias("__w")
    )
    # bit b of the fingerprint = 1 iff the ±1 vote sum for bit b is > 0
    bits = " + ".join(
        "CAST(CASE WHEN __w.__v0 > 0 THEN 1 ELSE 0 END AS BIGINT)"
        if b == 0
        else f"shiftleft(CAST(CASE WHEN __w.__v{b} > 0 THEN 1 ELSE 0 END AS BIGINT), {b})"
        for b in range(64)
    )
    return votes.select(
        F.col(id_col),
        F.expr(bits).alias("simhash"),
        F.col("__w.n_tokens").alias("n_tokens"),
    )


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: split the 64-bit fingerprint into
    ``blocks`` segments; by pigeonhole, any pair within
    ``max_hamming < blocks`` bits shares at least one exact segment →
    equi-join per segment, then verify hamming ≤ max_hamming.

    The fingerprint table is eagerly checkpointed before the self-join:
    both join sides reference it, and without a materialization barrier
    Spark recomputes the whole explode+agg fingerprint pass once PER
    SIDE (measured 3–5× the stage cost at sf0.1). The checkpoint is one
    (id, simhash) long per doc — at cluster scale the same barrier is a
    parquet write of the fingerprint table, which a real pipeline wants
    anyway (fingerprints are reusable across dedup runs)."""
    sh = (
        simhash_docs(df, text_col, id_col)
        .select(F.col(id_col), F.col("simhash"))
        .localCheckpoint(eager=True)
    )
    seg_bits = 64 // blocks
    mask = (1 << seg_bits) - 1
    segmented = sh.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), i * seg_bits).bitwiseAND(F.lit(mask))
                    for i in range(blocks)
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
        # verify BEFORE the dedup shuffle: hamming is a per-pair codegen
        # expression, so filtering first shrinks the distinct input from
        # all segment-collisions to only true near-pairs
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
