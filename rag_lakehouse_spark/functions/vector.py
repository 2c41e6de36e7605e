"""Vector expression library: dot / norm / cosine / L2 as pure Catalyst
expressions over ``array<float>`` columns.

This is the engine's replacement for the reference's external vector
store (ChromaDB k-NN at reference src/api.py:38-42): distances are
column expressions, so similarity search is just ``ORDER BY score LIMIT
k`` and Catalyst compiles the whole thing into whole-stage-codegen —
no Python in the hot path, no service round-trip.

Determinism: folds are strict left-to-right over the array with a
DOUBLE accumulator, so a given row produces bit-identical scores on
every engine/run — required for the DuckDB oracle comparison and for
reproducible top-k cuts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Left-fold double-precision dot product of two array columns."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity (not distance): dot / (|a| * |b|ₙ + 1e-24).

    The +1e-24 zero-norm guard keeps an all-zero vector's score at 0.0
    instead of NULL/NaN; for any real norm product (≥ ~1e-8) the add is
    below one double ulp, so scores are bit-unchanged. duckdb_cosine
    applies the IDENTICAL guard — the twins stay hash-equal."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b) + F.lit(1e-24))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    """Euclidean distance (the reference's Chroma default metric)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    diffs = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))
    )
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x))


# DuckDB oracle fragments computing the *same* folds (generate_series is
# inclusive like Spark's sequence; list indexing is 1-based in both).
def duckdb_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def duckdb_cosine(a: str, b: str) -> str:
    # zero-norm guard mirrors cosine() above — same value, same bits
    return (
        f"({duckdb_dot(a, b)} / "
        f"(sqrt({duckdb_dot(a, a)}) * sqrt({duckdb_dot(b, b)}) + 1e-24))"
    )


def md5_embed(col: Column | str, dim: int = 16) -> Column:
    """Portable pseudo-embedding: component t is hex digit t of
    md5(text) mapped to the exact binary quarter (digit − 8) / 4 —
    every value an exact double in [−2.0, 1.75], so downstream fold
    cosines are bit-identical cross-engine (the frozen-formula-artifact
    trick from the ANN twins, applied to the EMBEDDER itself; the
    production hash-seeded ``pseudo_embed_udf``/real-model path stays
    the throughput embedder). dim ≤ 32 (md5 has 32 hex chars).

    Built on the proven Spark ``conv(substring(md5(s)))`` == DuckDB
    ``('0x' || substr(md5(s)))::BIGINT`` idiom (operators/
    dedup_portable.py), including Unicode inputs."""
    if not 1 <= dim <= 32:
        # past the 32 hex chars the twins would fail DIFFERENTLY:
        # Spark substring('') -> conv NULL (silent NULL components),
        # DuckDB CAST('0x' AS BIGINT) -> loud error
        raise ValueError(f"md5_embed dim must be in [1, 32], got {dim}")
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(c.cast("binary"))
    return F.array(
        *[
            (
                (F.conv(F.substring(h, t, 1), 16, 10).cast("double") - F.lit(8.0))
                / F.lit(4.0)
            )
            for t in range(1, dim + 1)
        ]
    )


def duckdb_md5_embed(s: str, dim: int = 16) -> str:
    """The DuckDB twin of ``md5_embed`` — identical digits, identical
    quarters."""
    if not 1 <= dim <= 32:
        raise ValueError(f"duckdb_md5_embed dim must be in [1, 32], got {dim}")
    return (
        f"list_transform(generate_series(1, {dim}), i -> "
        f"(CAST(('0x' || substr(md5({s}), i, 1)) AS BIGINT) - 8) / 4.0)"
    )
