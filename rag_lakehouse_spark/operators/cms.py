"""Portable count-min sketch: sublinear frequency estimation whose
every counter is externally reproducible.

The CMS is the additive sibling of the repo's sketch family (HLL =
max-mergeable registers, Bloom = OR-mergeable bits, CMS =
SUM-mergeable counters): d=4 rows of w=512 counters, each token
incrementing one counter per row at the TOP 9 bits of an independent
affine transform of its portable 60-bit hash (top bits depend on every
input bit; the low bits of an affine map mod 2^60 would correlate the
rows). A point estimate is the MIN across the d counters — an
OVERestimate by construction, never an under-estimate, which the
report surfaces as exact data.

Scale: the build is one groupBy((row, counter)).count() over d
position rows per token — map-side combine bounds the shuffle by
d*w = 2048 counter partials per task whatever the corpus size, and
counters are mergeable sums, so the same fold serves streaming
maintenance (``streaming.rollup_sink.maintain_cms_counters``) and
hypertable-style re-aggregation. The sketch itself is 2048 rows —
broadcastable for the estimate join.

Reference parity: the reference has no sketch layer; this is part of
the training-data-pipeline surface beyond it (heavy-token discovery /
frequency monitoring at 100 TB).
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

# d=4 independent affine transforms — DISTINCT from the Bloom family's
# constants so the two sketches never share collision structure.
CMS_AB: tuple[tuple[int, int], ...] = (
    (0xC2B2AE3D, 0x38495AB5),
    (0xA0761D65, 0x8EBC6AF1),
    (0xE7037ED1, 0x589965CD),
    (0x1D8E4E27, 0xEB44ACCB),
)

CMS_W = 512  # counters per row -> positions are the top 9 of 60 bits
CMS_D = len(CMS_AB)
_POS_SHIFT = 51  # 60 - 9


def _hash60(token: Column) -> Column:
    return base60(F.concat(F.lit("cms:"), token.cast("string")))


def _duckdb_hash60(token_sql: str) -> str:
    return duckdb_base60(f"'cms:' || CAST({token_sql} AS VARCHAR)")


def cms_positions(token: Column) -> list[Column]:
    """The counter index (in [0, CMS_W)) per sketch row for one token."""
    h = _hash60(token)
    return [F.shiftright(affine60(h, a, b), _POS_SHIFT) for a, b in CMS_AB]


def duckdb_cms_positions(token_sql: str) -> list[str]:
    h = _duckdb_hash60(token_sql)
    return [f"({duckdb_affine60(h, a, b)} >> {_POS_SHIFT})" for a, b in CMS_AB]


def cms_build(toks: DataFrame, token_col: str) -> DataFrame:
    """Distributed build -> the sketch as (j, idx, c) counter rows
    (at most CMS_D * CMS_W = 2048). posexplode emits the d position
    rows per token; map-side combine bounds the shuffle by the sketch
    size per task.

    The 60-bit base hash is materialized in its OWN projection before
    the generator: inlined into the posexplode array it is re-evaluated
    once per affine row (d=4 md5+conv per token instead of 1) — no
    common-subexpression elimination reaches inside generator arrays.
    Measured at sf0.1: 2.51 s -> 0.90 s for the build (r15; same
    pathology class as functions.text.normalized_relation)."""
    h = toks.select(_hash60(F.col(token_col)).alias("__h"))
    return (
        h.select(
            F.posexplode(
                F.array(
                    *[
                        F.shiftright(affine60(F.col("__h"), a, b), _POS_SHIFT)
                        for a, b in CMS_AB
                    ]
                )
            ).alias("j", "idx")
        )
        .groupBy("j", "idx")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def cms_estimate(sketch: DataFrame, items: DataFrame, item_col: str) -> DataFrame:
    """Point estimates: min across the d counters for each item row.
    The sketch broadcasts (≤ 2048 rows by the PARAMETERS); items keep
    all their columns.

    Contract (r12, from review): ``items`` rows must be DISTINCT and
    every column group-by-able (no map columns) — the per-item min is
    recovered by ``groupBy(*items.columns)``, so duplicate item rows
    collapse to one output row and unorderable column types fail the
    groupBy. Current callers pass distinct heavy-hitter rows; callers
    with duplicate rows should attach a row key
    (``monotonically_increasing_id``) before calling."""
    pos = items.select(
        "*",
        F.posexplode(F.array(*cms_positions(F.col(item_col)))).alias("j", "idx"),
    )
    # LEFT join: an item whose (j, idx) counter was never incremented
    # has count 0 by CMS definition — an inner join would drop the row
    # (or overestimate from the colliding counters alone) for items
    # outside the build corpus.
    joined = pos.join(F.broadcast(sketch), ["j", "idx"], "left").withColumn(
        "c", F.coalesce("c", F.lit(0).cast("bigint"))
    )
    others = [c for c in items.columns]
    return joined.groupBy(*others).agg(F.min("c").cast("bigint").alias("cms_est"))


def duckdb_cms_sketch_cte(toks_sql: str, token_sql: str) -> str:
    """CTE text producing ``cms_sketch(j, idx, c)`` — the same counter
    rows ``cms_build`` computes, from a token-rows subquery."""
    rows = " UNION ALL ".join(  # cms_toks aliases the token column to `tok`
        f"SELECT {j} AS j, {p} AS idx FROM cms_toks"
        for j, p in enumerate(duckdb_cms_positions("tok"))
    )
    return f"""
    cms_toks AS (SELECT {token_sql} AS tok FROM ({toks_sql})),
    cms_pos AS ({rows}),
    cms_sketch AS (
      SELECT j, idx, CAST(COUNT(*) AS BIGINT) AS c
      FROM cms_pos GROUP BY j, idx
    )"""


def duckdb_cms_idx_case(token_sql: str, j_sql: str) -> str:
    """SQL expression: the counter index of ``token_sql`` for sketch
    row ``j_sql`` (CASE over the d affine transforms)."""
    whens = " ".join(
        f"WHEN {j} THEN {p}"
        for j, p in enumerate(duckdb_cms_positions(token_sql))
    )
    return f"(CASE {j_sql} {whens} END)"
