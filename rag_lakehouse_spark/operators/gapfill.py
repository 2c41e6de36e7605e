"""Dense time-spine generation and gap filling (LOCF + linear
interpolation) over bucketed time series — the TimescaleDB
``time_bucket_gapfill``/``locf``/``interpolate`` surface re-expressed
as DataFrame ops (the reference has no time-series engine; this is
the missing-bucket half of the hypertable rollup family in
``operators/rollup.py``).

Scale notes
-----------
The fill windows run over the *aggregated* (key x bucket) table, whose
row count is bounded by calendar-span/bucket-width times |keys| — not
by raw data volume. The raw scan collapses map-side into the hourly
partials first, so a 100 TB events table still produces only
(hours x types) rows into the window stage. Each key's series sorts
within one task; with very few keys and decade spans, range-partition
the spine by time and stitch the per-range boundary carry values (two
rows per cut) — the same partial-merge trick the rollup cascade uses.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rag_lakehouse_spark.operators.range_join import epoch_micros


def time_spine(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    step: str = "1 hour",
    trunc: str = "hour",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Dense (key x bucket) grid from the global [min, max] of
    ``ts_col``, one row per key combination per step. The bounds row is
    a 1-row aggregate broadcast against the distinct keys, and each key
    row explodes a ``sequence()`` — no shuffle beyond the two tiny
    aggregations."""
    bounds = df.select(
        F.date_trunc(trunc, F.min(ts_col)).alias("__lo"),
        F.date_trunc(trunc, F.max(ts_col)).alias("__hi"),
    )
    keys_df = df.select(*keys).distinct()
    return keys_df.crossJoin(F.broadcast(bounds)).select(
        *keys,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"interval {step}"))
        ).alias(bucket_col),
    )


def _observed_t(value_col: str, bucket_us: Column) -> Column:
    return F.when(F.col(value_col).isNotNull(), bucket_us)


def gapfill(
    spine: DataFrame,
    observed: DataFrame,
    keys: Sequence[str],
    bucket_col: str = "bucket",
    value_col: str = "v",
) -> DataFrame:
    """Left-join ``observed`` (keys + bucket + measure columns) onto the
    dense ``spine`` and add two filled variants of ``value_col``:

    - ``locf_<v>``  — last non-null observation carried forward
      (NULL before the first observation),
    - ``interp_<v>`` — linear interpolation between the previous and
      next non-null observations, time-weighted on the bucket's epoch
      micros (NULL outside the observed envelope). Observed buckets
      keep their own value in both variants.

    "Observed" is defined by ``value_col`` being non-null, so a bucket
    whose aggregate is NULL (e.g. SUM over all-null measures) is
    treated as a gap — mirrored verbatim by the DuckDB oracle.
    """
    j = spine.join(observed, on=[*keys, bucket_col], how="left")
    w = Window.partitionBy(*keys).orderBy(bucket_col)
    wp = w.rowsBetween(Window.unboundedPreceding, -1)
    wn = w.rowsBetween(1, Window.unboundedFollowing)
    b_us = epoch_micros(F.col(bucket_col))
    v = F.col(value_col)
    p_v = F.last(v, ignorenulls=True).over(wp)
    p_t = F.last(_observed_t(value_col, b_us), ignorenulls=True).over(wp)
    n_v = F.first(v, ignorenulls=True).over(wn)
    n_t = F.first(_observed_t(value_col, b_us), ignorenulls=True).over(wn)
    interp = F.when(v.isNotNull(), v).otherwise(
        # identical operation order to the oracle SQL: one subtraction,
        # one long/long double division, one multiply, one add
        p_v + (n_v - p_v) * ((b_us - p_t) / (n_t - p_t))
    )
    return j.withColumn(f"locf_{value_col}", F.coalesce(v, p_v)).withColumn(
        f"interp_{value_col}", interp
    )
