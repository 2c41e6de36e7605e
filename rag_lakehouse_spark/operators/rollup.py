"""Hypertable-style multi-resolution time rollup (continuous
aggregates).

A time-series table queried at several grains (hour / day / month)
should not re-scan the raw data once per grain: every grain coarser
than the finest is derivable by RE-AGGREGATING the next finer grain's
partials, the way timescale-style continuous aggregates and streaming
cascades maintain their hierarchies. This operator scans the input
ONCE (the finest grain's groupBy), then each coarser level aggregates
the previous level's output — at 100 TB the raw scan+shuffle happens
once and every further level works on buckets·groups rows (thousands,
not billions).

Only re-aggregatable measures compose this way: count → sum of
partial counts, sum → sum, min → min, max → max. Non-decomposable
aggregates (exact distinct, exact median) need sketches instead —
pair this with HLL/quantile sketch columns for those (the partial
sketches merge exactly like the additive partials here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# measure -> (leaf aggregate over raw rows, re-aggregate over partials)
_REAGG = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}

# sketch measures: partials are mergeable binary sketches, the output
# column is the estimate extracted at each level. HLL register-maxima
# merges are associative and order-insensitive, so the cascade yields
# the IDENTICAL sketch a direct aggregation would — this is how
# non-additive measures (distinct users) survive re-aggregation.
# (leaf sketch over raw, union over partials, finalize -> estimate)
_SKETCH = {
    "approx_distinct": (
        lambda c: F.hll_sketch_agg(c),
        lambda c: F.hll_union_agg(c),
        lambda c: F.hll_sketch_estimate(c),
    ),
}

# grain name -> (date_trunc unit, ordering rank from finest to coarsest)
_GRAINS = ["minute", "hour", "day", "month", "year"]


def time_rollup(
    df: DataFrame,
    ts_col: str,
    measures: dict[str, tuple[str, str]],
    grains: tuple[str, ...] = ("hour", "day", "month"),
    extra_keys: tuple[str, ...] = (),
    materialize_levels: bool = True,
) -> DataFrame:
    """Aggregate ``df`` at every grain in ``grains`` (ordered finest →
    coarsest), scanning the raw rows only for the finest grain and
    deriving each coarser grain from the previous one's partials.

    ``measures`` maps output column name → (kind, source column) with
    kind in {count, sum, min, max, approx_distinct}; the source column
    is ignored for count. ``approx_distinct`` carries a mergeable HLL
    sketch between levels and emits the estimate (bigint) at each
    level. Returns the union of all levels with columns
    ``(grain, bucket_start, *extra_keys, *measures)``, bucket_start
    being the truncated timestamp of the bucket.
    """
    order = {g: i for i, g in enumerate(_GRAINS)}
    if any(g not in order for g in grains):
        raise ValueError(f"grains must be among {_GRAINS}")
    if list(grains) != sorted(grains, key=order.__getitem__):
        raise ValueError("grains must be ordered finest to coarsest")
    for kind, _src in measures.values():
        if kind not in _REAGG and kind not in _SKETCH:
            raise ValueError(f"measure kind {kind!r} is not re-aggregatable")

    def _leaf_agg(name, kind, src):
        if kind in _SKETCH:
            return _SKETCH[kind][0](F.col(src)).alias(f"__sk_{name}")
        return _REAGG[kind][0](F.col(src)).alias(name)

    def _re_agg(name, kind):
        if kind in _SKETCH:
            return _SKETCH[kind][1](F.col(f"__sk_{name}")).alias(f"__sk_{name}")
        return _REAGG[kind][1](F.col(name)).alias(name)

    def _finalized(level_df, grain):
        cols = [F.lit(grain).alias("grain"), F.col("bucket_start"), *extra_keys]
        for name, (kind, _src) in measures.items():
            if kind in _SKETCH:
                cols.append(_SKETCH[kind][2](F.col(f"__sk_{name}")).alias(name))
            else:
                cols.append(F.col(name))
        return level_df.select(*cols)

    finest = grains[0]
    leaf = df.groupBy(
        F.date_trunc(finest, F.col(ts_col)).alias("bucket_start"), *extra_keys
    ).agg(*[_leaf_agg(name, kind, src) for name, (kind, src) in measures.items()])
    if materialize_levels and len(grains) > 1:
        # Each grain feeds BOTH the output union and the next grain; a
        # lazy union would re-derive the whole lineage per branch (3
        # raw scans for 3 grains). Materializing each partial table —
        # buckets × groups rows, vanishingly small next to the raw
        # data — makes the cascade real: ONE raw scan, every coarser
        # grain reads the previous partials. (In production these ARE
        # stored tables; localCheckpoint is the in-session stand-in,
        # eager so blocks are RDD-owned and ContextCleaner-reclaimed.)
        leaf = leaf.localCheckpoint(eager=True)
    levels = [_finalized(leaf, finest)]
    prev = leaf
    for g in grains[1:]:
        prev = prev.groupBy(
            F.date_trunc(g, F.col("bucket_start")).alias("bucket_start"), *extra_keys
        ).agg(*[_re_agg(name, kind) for name, (kind, _src) in measures.items()])
        if materialize_levels and g != grains[-1]:
            prev = prev.localCheckpoint(eager=True)
        levels.append(_finalized(prev, g))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
