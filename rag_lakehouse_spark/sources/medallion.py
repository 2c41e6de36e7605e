"""Medallion-zone pipeline: raw JSON → bronze (rename contract) →
silver (typed, derived, pruned) → gold-ready chunk/embed inputs.

Re-expresses the reference pipeline Spark-first:

- raw: the scraper's one-JSON-object-per-record zone
  (reference jobs/scraper.py:159-179) becomes ``spark.read.json`` on a
  prefix — the engine ingests; scraping stays outside the query path.
- bronze: the rename-iff-exists contract
  (reference jobs/bronze_transformation.py:21-30,69-71), schema-drift
  tolerant.
- silver: the declared 14-column typed contract with regex parsing,
  null repair and cast enforcement
  (reference jobs/silver_transformation.py:23-117) as ONE select of
  typed expressions (Catalyst collapses it anyway; one projection keeps
  the contract readable).
- writes: direct partitioned parquet with ``partitionBy(run_id,
  run_date)`` replacing the reference's key-path encoding + manual
  part upload (jobs/bronze_transformation.py:73-80) — partition
  pruning replaces prefix listing, the parquet committer replaces the
  hand-rolled copy loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rag_lakehouse_spark.sources.storage import join_uri

# Bronze rename contract (reference jobs/bronze_transformation.py:21-30).
# Applied only when the source column exists — scraped records are
# ragged (an XPath that never matched yields no key at all).
BRONZE_RENAMES: dict[str, str] = {
    "title_xpath": "title",
    "price_xpath": "price",
    "availability_xpaths": "availability",
    "description_xpaths": "description",
    "category_xpath": "category",
    "review_count_xpath": "review_count",
}

# Silver contract: declared column -> Spark type, in declared order
# (reference jobs/silver_transformation.py:23-38).
SILVER_SCHEMA: dict[str, str] = {
    "run_id": "string",
    "run_date": "string",
    "title": "string",
    "price": "double",
    "price_text": "string",
    "currency_symbol": "string",
    "quantity": "int",
    "stock_status": "string",
    "description": "string",
    "category": "string",
    "review_count": "int",
    "book_url": "string",
    "scraped_at": "string",
    "id": "string",
}


def read_raw_json(spark: SparkSession, path: str) -> DataFrame:
    """Raw-zone scan: a directory of JSON objects is one dataset.
    Replaces the reference's driver-side ThreadPool fetch loop
    (jobs/bronze_transformation.py:42-52) with a distributed read."""
    return spark.read.json(path)


def bronze_transform(df: DataFrame) -> DataFrame:
    """Apply the rename contract, tolerating missing source columns."""
    existing = {old: new for old, new in BRONZE_RENAMES.items() if old in df.columns}
    return df.withColumnsRenamed(existing) if existing else df


def silver_transform(df: DataFrame, run_id: str) -> DataFrame:
    """Bronze → silver: derive, parse, repair, cast, prune — the full
    declared contract as a single typed projection.

    Derivations (reference jobs/silver_transformation.py:40-82):
      run_date        date_format(scraped_at, 'yyyy-MM-dd')        (:47)
      currency_symbol regexp_extract(price, '^(\\D+)', 1)          (:50)
      price           regexp_replace(price, '^(\\D+)', '') → double (:53)
      price_text      original price string                         (:55)
      stock_status    regexp_extract(availability, '^([^\\(]+)', 1) (:57)
      quantity        regexp_extract(availability, '\\((\\d+)', 1)
                      → int, null → 0                               (:63-72)
    Casts use try_cast (Spark 4 ANSI-safe) to keep the reference's
    cast-to-null semantics.
    """
    price = F.col("price")
    avail = F.col("availability")
    derived = {
        "run_id": F.lit(run_id),
        "run_date": F.date_format(F.col("scraped_at"), "yyyy-MM-dd"),
        "currency_symbol": F.regexp_extract(price, r"^(\D+)", 1),
        "price_text": price,
        "stock_status": F.regexp_extract(avail, r"^([^\(]+)", 1),
        "quantity": F.coalesce(
            F.regexp_extract(avail, r"\((\d+)", 1).try_cast("int"), F.lit(0)
        ),
        "price": F.regexp_replace(price, r"^(\D+)", "").try_cast("double"),
    }
    projection = []
    for name, dtype in SILVER_SCHEMA.items():
        expr = derived.get(name, F.col(name) if name in df.columns else F.lit(None))
        projection.append(expr.try_cast(dtype).alias(name))
    return df.select(*projection)


def write_zone(
    df: DataFrame,
    base_path: str,
    zone: str,
    partition_cols: tuple[str, ...] = ("run_id", "run_date"),
    mode: str = "overwrite",
    fmt: str | None = None,
) -> str:
    """Partitioned write for a medallion zone. Partition columns replace
    the reference's `{run_id}/{zone}/{date}` key-path encoding — readers
    get partition pruning instead of prefix listing.

    Format is gated on jar availability (sources.lakehouse): with Delta
    or Iceberg on the classpath the overwrite is an atomic snapshot
    swap — the capability the reference's hand-rolled local-staging +
    part-upload commit (jobs/bronze_transformation.py:73-80) lacks —
    otherwise plain parquet delete-then-write."""
    from rag_lakehouse_spark.sources.lakehouse import write_table

    out = join_uri(base_path, zone)
    write_table(df, out, fmt=fmt, mode=mode, partition_cols=partition_cols)
    return out


def observe_silver_quality(df: DataFrame):
    """Attach zero-cost in-flight quality metrics to the silver frame:
    row count, prices the cast repaired to null, quantities defaulted
    to 0 — collected by the ACTION that writes the zone (Spark's
    Observation API piggybacks on the job; no second scan, unlike the
    standalone dq_* audit queries, which re-scan for exact reports).

    Returns (observed_df, observation); read ``observation.get`` after
    the write action completes. At 100 TB this is the only affordable
    per-write audit — the write itself carries the counters.
    """
    from pyspark.sql import Observation

    obs = Observation("silver_quality")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("price").isNull(), 1)).alias("n_null_price"),
        F.count(F.when(F.col("quantity") == 0, 1)).alias("n_default_quantity"),
        F.count(F.when(F.col("title").isNull(), 1)).alias("n_null_title"),
    )
    return observed, obs


def run_pipeline(
    spark: SparkSession,
    raw_path: str,
    base_path: str,
    run_id: str,
) -> DataFrame:
    """raw JSON → bronze parquet → silver parquet; returns the silver
    DataFrame (read back from the written zone, as downstream stages —
    chunk/embed — would consume it).

    The table format is resolved ONCE and threaded through both writes
    and the read-back, so write and read can never disagree on what the
    zone is (read_table's auto-detection also covers delta AND iceberg,
    but the explicit thread-through removes the probe from the loop)."""
    from rag_lakehouse_spark.sources.lakehouse import best_format, read_table

    fmt = best_format(spark)
    bronze = bronze_transform(read_raw_json(spark, raw_path))
    write_zone(bronze.withColumn("run_id", F.lit(run_id)), base_path, "bronze",
               partition_cols=("run_id",), fmt=fmt)
    silver = silver_transform(bronze, run_id)
    write_zone(silver, base_path, "silver", fmt=fmt)
    return read_table(spark, join_uri(base_path, "silver"), fmt=fmt)
