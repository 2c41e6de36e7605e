"""Relational core: scans, projections, filters, scalar functions,
aggregations, joins, sorts/top-k, set ops, windows, grouping sets.

Covers SURVEY.md §2.2-§2.8. The reference itself uses only a sliver of
this surface (renames, casts, regexp scalars, when/otherwise — see
reference jobs/silver_transformation.py:40-82); the rest is the standard
engine surface the driver contract requires. Everything here is pure
built-in DataFrame API — Catalyst handles pushdown, pruning, join
selection and partial aggregation.

Scale notes (100 TB thinking) are on each query where relevant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from rag_lakehouse_spark.functions import text as TX

from rag_lakehouse_spark.plans.registry import register
from rag_lakehouse_spark.sources.tables import load_table


def _dec(c: str, prec: int = 12, scale: int = 2):
    """Decimal view of a money/ratio column: makes SUM order-independent
    and bit-exact across engines/partitionings (see registry docstring)."""
    return F.col(c).cast(f"decimal({prec},{scale})")


# --------------------------------------------------------------------------
# Aggregations (§2.5)
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)
        AS sum_disc_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2)))
               * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE)
        AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "groupby", "flagship"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → filter → groupBy → 8 aggregates.

    Scale: maps to partial (map-side) + final HashAggregate; only the
    2-key grouped partials shuffle, never raw rows. Filter and the
    7-column projection push into the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # ratio columns cast to DECIMAL(4,2): the triple product then stays
    # decimal(24,6) — inside BOTH engines' 38-digit width, so every
    # per-row product is exact. With (12,2) ratios the product hit
    # precision 40: Spark trimmed to (38,6) (still exact here) but
    # DuckDB PROMOTES an over-38 multiply to DOUBLE, whose per-row
    # rounding surfaces at ~6M rows (found by the r14 10x-volume
    # insurance sweep — sum_charge off by 1 ULP).
    disc_price = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 4, 2))
    charge = disc_price * (F.lit(1) + _dec("l_tax", 4, 2))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            # wide-scale money sums round to cents BEFORE the double
            # cast (TPC-H answer convention): a scale-6 decimal sum's
            # scaled integer passes 2^53 at ~10x sf0.1 volume, where
            # DuckDB's decimal->double cast double-rounds ((double)
            # hugeint / 10^scale) while Spark's BigDecimal cast is
            # correctly rounded — 1-ULP mismatch (r14 10x sweep).
            # Rounded to cents both engines cast exactly.
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_global_stats",
    oracle="""
    SELECT
      COUNT(*) AS n_rows,
      COUNT(DISTINCT l_orderkey) AS n_orders,
      COUNT(DISTINCT l_partkey) AS n_parts,
      CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
      CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM lineitem
    """,
    tags=("agg",),
)
def agg_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (no-key) aggregate incl. two COUNT DISTINCTs.

    Scale: Spark expands multi-distinct into an Expand + two-phase agg;
    still a single pass over the scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.min("l_quantity").cast("double").alias("min_qty"),
        F.max("l_quantity").cast("double").alias("max_qty"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("total_price"),
    )


@register(
    "group_rollup_nation",
    oracle="""
    SELECT r_name, n_name,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    tags=("agg", "rollup", "join"),
)
def group_rollup_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping-set aggregation over a 3-way dim join.

    Scale: nation/region are broadcast (tiny dims); rollup is one
    Expand + shuffle on the grouping-set id, not one shuffle per level.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(_dec("c_acctbal")).cast("double").alias("total_acctbal"),
    )


@register(
    "group_cube_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "cube"),
)
def group_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over order status × priority."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
    )


@register(
    "pivot_priority_by_status",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("agg", "pivot"),
)
def pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation). Explicit pivot values keep it one pass
    (no distinct-values pre-query) — required practice at scale."""
    o = load_table(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_p"),
    )


# --------------------------------------------------------------------------
# Joins (§2.6)
# --------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk", "flagship"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact joins → agg → top-k.

    Scale: customer (filtered) broadcasts into orders; orders⋈lineitem
    shuffles on orderkey. Final ORDER BY+LIMIT is TakeOrderedAndProject
    (per-partition top-k, no global sort).
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_nation_revenue",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("join", "agg", "flagship"),
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with a cross-dimension equality
    (customer nation == supplier nation) and a region filter.

    Scale: region/nation/supplier broadcast; the orders⋈lineitem
    shuffle on orderkey is the only big exchange. Catalyst pushes the
    region filter through the join chain (partition-prunable if nation
    were a partition column).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (F.col("c_nationkey") == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@register(
    "join_left_order_counts",
    oracle="""
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS total_spend
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
    tags=("join", "agg"),
)
def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving customers with zero orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(_dec("o_totalprice")), F.lit(0).cast("decimal(12,2)"))
            .cast("double")
            .alias("total_spend"),
        )
    )


@register(
    "join_anti_idle_customers",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    tags=("join", "anti"),
)
def join_anti_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers with no orders (NOT EXISTS)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "join_semi_active_suppliers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00')
    """,
    tags=("join", "semi"),
)
def join_semi_active_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): suppliers with recent shipments."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp")
    )
    return s.join(li, s.s_suppkey == li.l_suppkey, "left_semi").select("s_suppkey", "s_name")


@register(
    "join_full_outer_daily",
    oracle="""
    WITH o AS (
      SELECT strftime(o_orderdate, '%Y-%m-%d') AS d, COUNT(*) AS n_orders
      FROM orders WHERE o_orderdate >= TIMESTAMP '2001-07-01 00:00:00' GROUP BY 1
    ),
    l AS (
      SELECT strftime(l_shipdate, '%Y-%m-%d') AS d, COUNT(*) AS n_ships
      FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-07-01 00:00:00' GROUP BY 1
    )
    SELECT COALESCE(o.d, l.d) AS day,
           COALESCE(n_orders, 0) AS n_orders,
           COALESCE(n_ships, 0) AS n_ships
    FROM o FULL OUTER JOIN l ON o.d = l.d
    """,
    tags=("join", "outer"),
)
def join_full_outer_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregated calendars (order days vs ship
    days — ship dates extend past the last order date)."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-07-01 00:00:00").cast("timestamp"))
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.lit("2001-07-01 00:00:00").cast("timestamp"))
        .groupBy(F.date_format("l_shipdate", "yyyy-MM-dd").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_ships"))
    )
    return o.join(li, o.d == li.d, "full_outer").select(
        F.coalesce(o.d, li.d).alias("day"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_ships", F.lit(0)).alias("n_ships"),
    )


@register(
    "join_cross_region_status",
    oracle="""
    SELECT r_name, o_orderstatus
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
    tags=("join", "cross"),
)
def join_cross_region_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two small relations (calendar-style scaffold)."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    s = load_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s)


@register(
    "join_nonequi_price_band",
    oracle="""
    SELECT b.band, COUNT(*) AS n_orders
    FROM orders
    JOIN (VALUES ('low', 0.0, 50000.0), ('mid', 50000.0, 150000.0),
                 ('high', 150000.0, 1000000000.0)) AS b(band, lo, hi)
      ON o_totalprice >= b.lo AND o_totalprice < b.hi
    GROUP BY b.band
    """,
    tags=("join", "nonequi"),
)
def join_nonequi_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta/range) join against a tiny banding dim.

    Scale: small side broadcasts → BroadcastNestedLoopJoin; at 100 TB a
    range join with a large band table would instead bucketize the range
    key and equi-join on the bucket (see operators.asof)."""
    o = load_table(spark, sf_dir, "orders")
    bands = F.broadcast(
        spark.createDataFrame(
            [("low", 0.0, 50000.0), ("mid", 50000.0, 150000.0), ("high", 150000.0, 1e9)],
            "band string, lo double, hi double",
        )
    )
    return (
        o.join(bands, (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi))
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --------------------------------------------------------------------------
# Filters / projections / scalar functions (§2.2-2.4)
# --------------------------------------------------------------------------


@register(
    "filter_predicates",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders
    WHERE o_orderstatus IN ('O', 'P')
      AND o_totalprice BETWEEN 10000 AND 200000
      AND o_orderpriority LIKE '1-%'
      AND o_orderdate IS NOT NULL
    """,
    tags=("filter",),
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate: IN / BETWEEN / LIKE / IS NOT NULL.

    Scale: all four conjuncts push down to the parquet scan
    (PushedFilters), so row groups failing min/max stats never load.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "P")
        & F.col("o_totalprice").between(10000, 200000)
        & F.col("o_orderpriority").like("1-%")
        & F.col("o_orderdate").isNotNull()
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
    )


@register(
    "project_cast_null_repair",
    oracle="""
    SELECT event_id,
           -- trunc: Spark's double->int cast truncates toward zero,
           -- DuckDB's rounds to nearest
           TRY_CAST(trunc(value) AS INTEGER) AS value_int,
           COALESCE(TRY_CAST(trunc(value) AS INTEGER), 0) AS value_filled,
           CASE WHEN event_type = 'purchase' THEN 'revenue'
                WHEN event_type IN ('click', 'view') THEN 'engagement'
                ELSE 'other' END AS event_class,
           CAST(user_id AS VARCHAR) AS user_str
    FROM events
    """,
    tags=("project", "cast"),
)
def project_cast_null_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silver-contract semantics: try_cast type enforcement +
    when/otherwise null repair + string cast.

    Mirrors the reference's cast-and-prune schema contract
    (reference jobs/silver_transformation.py:69-82) on the events table.
    """
    e = load_table(spark, sf_dir, "events")
    vi = F.col("value").try_cast("int")
    return e.select(
        "event_id",
        vi.alias("value_int"),
        F.coalesce(vi, F.lit(0)).alias("value_filled"),
        F.when(F.col("event_type") == "purchase", "revenue")
        .when(F.col("event_type").isin("click", "view"), "engagement")
        .otherwise("other")
        .alias("event_class"),
        F.col("user_id").cast("string").alias("user_str"),
    )


@register(
    "string_scalar_funcs",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '^(\\w+)', 1) AS first_word,
           upper(lang) AS lang_upper,
           substring(source, 1, 3) AS src_prefix,
           length(text) AS text_len,
           concat_ws('|', lang, source) AS lang_source,
           regexp_replace(replace(text, 'the', ' '), '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g') <> '' AS has_non_the,
           regexp_replace(text, '\\d+', '#') AS digits_masked
    FROM documents
    """,
    tags=("string", "regex"),
)
def string_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/regex scalar surface: the reference's silver parsing idiom
    (regexp_extract/regexp_replace/trim — reference
    jobs/silver_transformation.py:50-66) applied to the documents corpus.
    All JVM-side, whole-stage-codegen'd."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"^(\w+)", 1).alias("first_word"),
        F.upper("lang").alias("lang_upper"),
        F.substring("source", 1, 3).alias("src_prefix"),
        F.length("text").alias("text_len"),
        F.concat_ws("|", "lang", "source").alias("lang_source"),
        (TX.edge_trim(F.replace(F.col("text"), F.lit("the"), F.lit(" "))) != "").alias("has_non_the"),
        F.regexp_replace("text", r"\d+", "#").alias("digits_masked"),
    )


@register(
    "date_scalar_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           day(o_orderdate) AS order_day,
           strftime(o_orderdate, '%Y-%m') AS order_ym,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch_start
    FROM orders
    WHERE o_orderkey < 1000
    """,
    tags=("date",),
)
def date_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar surface (year/month/day, format, trunc, diff).

    The reference only ever formats (`date_format` at
    jobs/silver_transformation.py:47); this is the full engine surface.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_ym"),
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1995-01-01").cast("date"),
        ).alias("days_since_epoch_start"),
    )


@register(
    "math_scalar_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 50000) AS price_dev,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_kilo,
           CAST(ceil(l_quantity / 10.0) AS BIGINT) AS qty_decile,
           sqrt(l_extendedprice) AS price_sqrt,
           l_orderkey % 7 AS key_mod,
           greatest(l_quantity, 25.0) AS qty_floor25,
           least(l_quantity, 25.0) AS qty_cap25
    FROM lineitem
    WHERE l_orderkey < 500
    """,
    tags=("math",),
)
def math_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar surface (abs/floor/ceil/sqrt/mod/greatest/least) —
    all IEEE-deterministic ops (no libm transcendentals in the oracle
    path, those differ in last-bit across engines)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000).alias("price_dev"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_kilo"),
        F.ceil(F.col("l_quantity") / 10.0).alias("qty_decile"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("qty_floor25"),
        F.least(F.col("l_quantity"), F.lit(25.0)).alias("qty_cap25"),
    )


# --------------------------------------------------------------------------
# Sorts / limits / top-k (§2.7), set ops / distinct (§2.8)
# --------------------------------------------------------------------------


@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("topk", "sort"),
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k. Scale: ORDER BY+LIMIT compiles to
    TakeOrderedAndProject — each partition keeps its local top 20, the
    driver merges 20×partitions rows; no global sort ever happens."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "setop_intersect_except",
    oracle="""
    WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE year(o_orderdate) = 1995),
         y96 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE year(o_orderdate) = 1996)
    SELECT 'both' AS cohort, o_custkey FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)
    UNION ALL
    SELECT 'only_1995' AS cohort, o_custkey FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
    """,
    tags=("setop",),
)
def setop_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL in one cohort query."""
    o = load_table(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    both = y95.intersect(y96).select(F.lit("both").alias("cohort"), "o_custkey")
    only95 = y95.exceptAll(y96).select(F.lit("only_1995").alias("cohort"), "o_custkey")
    return both.unionAll(only95)


@register(
    "distinct_segments",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    """,
    tags=("distinct",),
)
def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (dedup by all columns)."""
    return load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


# --------------------------------------------------------------------------
# Window functions (§2.8)
# --------------------------------------------------------------------------


@register(
    "window_rank_top_orders",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn,
             RANK() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
             DENSE_RANK() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS drnk
      FROM orders) t
    WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def window_rank_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3-per-group via ranking window functions.

    Scale: one shuffle on the partition key; Spark's WindowGroupLimit
    pushes the rn<=3 limit into the sort so only 3 rows per group
    survive the exchange (AQE)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(*) OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS moving_avg_3
    FROM orders
    WHERE o_custkey < 100
    """,
    tags=("window", "frame"),
)
def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + 3-row moving average (ROWS frames).

    Decimal accumulation keeps window sums bit-exact; avg over a ≤3-row
    decimal frame divides exactly the same way in both engines
    (decimal avg → both compute sum/count; cast after).
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    dec_price = _dec("o_totalprice")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec_price)
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_spend"),
        (
            F.sum(dec_price).over(w.rowsBetween(-2, W.currentRow)).cast("double")
            / F.count(F.lit(1)).over(w.rowsBetween(-2, W.currentRow))
        ).alias("moving_avg_3"),
    )


@register(
    "window_lag_lead_orders",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           date_diff('day',
                     LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey),
                     o_orderdate) AS days_since_prev,
           LEAD(o_orderkey) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS next_orderkey,
           FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey) AS first_orderkey
    FROM orders
    WHERE o_custkey < 100
    """,
    tags=("window", "analytic"),
)
def window_lag_lead_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD/FIRST_VALUE analytic functions (inter-order gaps)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lag(F.col("o_orderdate").cast("date")).over(w)
        ).alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.first("o_orderkey").over(w).alias("first_orderkey"),
    )


@register(
    "window_ntile_share",
    oracle="""
    SELECT o_orderkey, o_custkey,
           NTILE(4) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS price_quartile,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE)
             / (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                FROM orders WHERE o_orderkey < 2000)
             AS price_share
    FROM orders
    WHERE o_orderkey < 2000
    """,
    tags=("window",),
)
def window_ntile_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing + share-of-total via a broadcast scalar
    aggregate (crossJoin of a one-row sum) — NOT an empty ``OVER ()``
    window, which would collapse the whole relation onto one partition.
    This is the scale-safe share-of-total pattern (same as
    ``nation_customer_share``); NTILE itself remains the operator under
    test and rides an ordered window over the filtered slice."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    w_ord = W.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    dec_price = _dec("o_totalprice")
    total = o.agg(F.sum(dec_price).cast("double").alias("__total"))
    return (
        o.crossJoin(F.broadcast(total))
        .select(
            "o_orderkey",
            "o_custkey",
            F.ntile(4).over(w_ord).alias("price_quartile"),
            (dec_price.cast("double") / F.col("__total")).alias("price_share"),
        )
    )


@register(
    "customer_scd2_merge",
    oracle="""
    WITH cur AS (
      SELECT c_custkey AS k, c_mktsegment AS segment,
             CAST(c_acctbal AS DOUBLE) AS bal,
             '2025-01-01 00:00:00' AS effective_from,
             CAST(NULL AS VARCHAR) AS effective_to,
             TRUE AS is_current
      FROM customer
    ), upd AS (
      SELECT k, 'MOVED' AS segment, bal + 100 AS bal FROM cur WHERE k % 10 = 0
      UNION ALL SELECT k, segment, bal FROM cur WHERE k % 10 = 1
      UNION ALL SELECT k + 1000000, segment, bal FROM cur WHERE k % 10 = 2
    ), affected AS (
      SELECT u.k FROM upd u JOIN cur c ON c.k = u.k AND c.is_current
      WHERE u.segment IS DISTINCT FROM c.segment
         OR u.bal IS DISTINCT FROM c.bal
      UNION
      SELECT u.k FROM upd u WHERE u.k NOT IN (SELECT k FROM cur WHERE is_current)
    )
    SELECT k, segment, bal, effective_from, effective_to, is_current
    FROM cur WHERE k NOT IN (SELECT k FROM affected)
    UNION ALL
    SELECT k, segment, bal, effective_from,
           '2026-01-01 00:00:00', FALSE
    FROM cur WHERE k IN (SELECT k FROM affected) AND is_current
    UNION ALL
    SELECT u.k, u.segment, u.bal, '2026-01-01 00:00:00',
           CAST(NULL AS VARCHAR), TRUE
    FROM upd u WHERE u.k IN (SELECT k FROM affected)
    """,
    tags=("scd2", "merge", "dimension"),
)
def customer_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 MERGE as a driver row: the customer dimension loads as
    all-open versions, then a deterministic update batch (every 10th
    key changes segment+balance, the next tenth arrives unchanged —
    change detection must pass it through untouched — and another
    tenth arrives as brand-new keys) runs through
    ``operators.scd.scd2_apply``; output is the full version table
    (closed + reopened + untouched). The oracle replicates the
    anti-join + union MERGE emulation in SQL. Turns the SCD machinery's
    pytest-only evidence into a hash-checked external row.

    Scale: see scd2_apply — two key shuffles, history rewrites only
    the touched keys' current rows; with Delta/Iceberg jars this
    collapses into one MERGE INTO."""
    from rag_lakehouse_spark.operators.scd import scd2_apply

    c = load_table(spark, sf_dir, "customer")
    cur = c.select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").cast("double").alias("bal"),
        F.lit("2025-01-01 00:00:00").alias("effective_from"),
        F.lit(None).cast("string").alias("effective_to"),
        F.lit(True).alias("is_current"),
    )
    upd = (
        cur.filter(F.col("k") % 10 == 0).select(
            "k", F.lit("MOVED").alias("segment"), (F.col("bal") + 100).alias("bal")
        )
        .unionByName(cur.filter(F.col("k") % 10 == 1).select("k", "segment", "bal"))
        .unionByName(
            cur.filter(F.col("k") % 10 == 2).select(
                (F.col("k") + 1000000).alias("k"), "segment", "bal"
            )
        )
    )
    return scd2_apply(
        cur, upd, "k", ("segment", "bal"), batch_ts="2026-01-01 00:00:00"
    )


@register(
    "orders_basket_affinity",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), stats AS (
      SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM items
    ), part_n AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c FROM items GROUP BY 1
    ), pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 3
    )
    SELECT part_a, part_b, c_ab,
           (CAST(c_ab AS DOUBLE) / stats.n_orders)
           / ((CAST(pa.c AS DOUBLE) / stats.n_orders)
              * (CAST(pb.c AS DOUBLE) / stats.n_orders)) AS lift
    FROM pairs
    JOIN part_n pa ON pa.l_partkey = part_a
    JOIN part_n pb ON pb.l_partkey = part_b, stats
    """,
    tags=("join", "affinity", "analytics"),
)
def orders_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: part pairs co-occurring in ≥3 orders
    with their LIFT (observed co-rate over independence) — the
    recommendation/assortment seed every commerce analytics stack
    computes. DISTINCT (order, part) first so line-level duplicates
    cannot inflate support.

    Exactness: support counts are integers; lift combines them as
    probability RATIOS (each count / n_orders as a double) — the
    overflow-free form, deterministic both engines.

    Scale: the pair self-join joins on l_orderkey, so fan-out per
    order is its basket size squared — bounded by the order-size
    contract (TPC-H: ≤ 7 lines), never corpus-quadratic; the support
    threshold prunes the long tail before the part-stats broadcast
    joins."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    stats = items.agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("n_orders")
    )
    part_n = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    a = items.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
        .filter(F.col("c_ab") >= 3)
    )
    pa = part_n.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("ca"))
    pb = part_n.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("cb"))
    j = (
        pairs.join(pa, "part_a")
        .join(pb, "part_b")
        .crossJoin(F.broadcast(stats))
    )
    n = F.col("n_orders").cast("double")
    lift = (F.col("c_ab").cast("double") / n) / (
        (F.col("ca").cast("double") / n) * (F.col("cb").cast("double") / n)
    )
    return j.select("part_a", "part_b", "c_ab", lift.alias("lift"))


@register(
    "orders_ship_latency_profile",
    oracle="""
    WITH lat AS (
      SELECT o.o_orderpriority,
             CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT)
               AS lat_days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           quantile_cont(lat_days, 0.5) AS p50_days,
           quantile_cont(lat_days, 0.95) AS p95_days,
           CAST(MAX(lat_days) AS BIGINT) AS max_days,
           CAST(SUM(CASE WHEN lat_days > 90 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_over_90d
    FROM lat GROUP BY o_orderpriority
    """,
    tags=("agg", "latency", "percentile", "operations"),
)
def orders_ship_latency_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship fulfillment latency per priority class: median,
    p95, worst case, and the count of 90-day SLA breaches — the
    operations profile that answers whether URGENT actually ships
    faster. Latency is an exact integer day difference of date-typed
    instants (no time-zone surface), so the exact percentile buffers
    the bounded latency domain (days within the order window), per the
    r8 percentile rule; the SLA breach count is a pure integer gate.

    Scale: one orderkey equi-join (AQE-handled), one per-priority
    aggregate — five output rows."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lat = o.join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderpriority",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).cast("bigint").alias("lat_days"),
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.percentile("lat_days", 0.5).alias("p50_days"),
        F.percentile("lat_days", 0.95).alias("p95_days"),
        F.max("lat_days").cast("bigint").alias("max_days"),
        F.sum(F.when(F.col("lat_days") > 90, 1).otherwise(0))
        .cast("bigint")
        .alias("n_over_90d"),
    )
