"""Additional TPC-H-shaped relational queries: conditional EXISTS,
group-HAVING with join-back, returned-revenue reporting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rag_lakehouse_spark.plans.registry import register
from rag_lakehouse_spark.sources.tables import load_table


@register(
    "q4_late_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
    tags=("join", "exists", "agg"),
)
def q4_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS with a correlated inequality (orders with
    a lineitem shipped >60 days after ordering), counted by priority.
    The semi-join carries the non-equi condition — no dedup needed."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(o.o_orderdate.cast("date"), 60)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@register(
    "q10_returned_revenue",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk"),
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20.
    Scale: returnflag filter pushes into the lineitem scan; nation
    broadcasts; one shuffle on orderkey, one on custkey."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(12,2)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q18_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
    )
    SELECT c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN big ON big.l_orderkey = o_orderkey
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
    tags=("join", "having", "agg"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate (orders with total
    quantity > 150) semi-joined back to the detail. Scale: the HAVING
    aggregate is the reducer; the join-back touches only qualifying
    keys."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("__q"))
        .filter(F.col("__q") > 150)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(qty).cast("double").alias("total_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "total_qty",
        )
    )


@register(
    "orders_monthly_trend",
    oracle="""
    WITH monthly AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS ym,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT ym, n_orders, revenue,
           revenue - LAG(revenue) OVER (ORDER BY ym) AS revenue_delta,
           CAST(SUM(CAST(revenue AS DECIMAL(18,4))) OVER (
             ORDER BY ym ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS revenue_cum
    FROM monthly
    """,
    tags=("agg", "window", "trend"),
)
def orders_monthly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-over-aggregate composition: monthly rollup, then
    month-over-month delta and running total on the aggregated rows
    (the aggregate output is tiny → the unpartitioned window is safe;
    decimal recast keeps the running sum order-independent)."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window as W

    monthly = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("ym")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("revenue"),
    )
    w = W.orderBy("ym")
    return monthly.select(
        "ym",
        "n_orders",
        "revenue",
        (F.col("revenue") - F.lag("revenue").over(w)).alias("revenue_delta"),
        F.sum(F.col("revenue").cast("decimal(18,4)"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("revenue_cum"),
    )


@register(
    "nation_customer_share",
    oracle="""
    SELECT n_name,
           COUNT(c_custkey) AS n_customers,
           CAST(COUNT(c_custkey) AS DOUBLE)
             / (SELECT COUNT(*) FROM customer) AS share,
           COUNT(c_custkey) FILTER (WHERE c_acctbal > 0) AS n_positive_bal
    FROM nation
    LEFT JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("join", "agg", "subquery"),
)
def nation_customer_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total via an uncorrelated scalar subquery (broadcast
    single-row aggregate) over a dim-preserving LEFT join — exact
    integer counts divided once, bit-identical across engines."""
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    total = c.agg(F.count(F.lit(1)).alias("__total"))
    return (
        n.join(c, c.c_nationkey == n.n_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.count(F.when(F.col("c_acctbal") > 0, 1)).alias("n_positive_bal"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "n_name",
            "n_customers",
            (F.col("n_customers").cast("double") / F.col("__total")).alias("share"),
            "n_positive_bal",
        )
    )


@register("media_features_pipeline", oracle=None, tags=("multimodal", "pandas"))
def media_features_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing over the driver tables: document text bytes
    as opaque binary 'media' content → mapInPandas byte features (the
    stub decode path) → pandas-UDF media embedding → cosine-ranked
    neighbors of item 0. Exercises the full binary-column pipeline
    shape (schema, Arrow batches, fan-out) with deterministic fakes."""
    from rag_lakehouse_spark.operators.multimodal import image_features, media_embed
    from rag_lakehouse_spark.operators.similarity import knn_exact

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("content"),
    )
    feats = image_features(d)
    emb = media_embed(d)
    q = emb.filter(F.col("media_id") == 0).select(
        F.lit(0).alias("query_id"), F.col("embedding").alias("q_emb")
    )
    hits = knn_exact(
        emb.filter(F.col("media_id") != 0), q, k=5, corpus_id="media_id"
    )
    return hits.join(feats, hits.neighbor_id == feats.media_id).select(
        "query_id", "neighbor_id", "rank", "mean_byte", "sha1"
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS ship_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS volume
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE n1.n_name IN ('NATION_1', 'NATION_2')
      AND n2.n_name IN ('NATION_1', 'NATION_2')
      AND n1.n_name <> n2.n_name
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    """,
    tags=("join", "agg", "tpch"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year — a 5-way join with TWO roles for the nation dim.

    Scale: both nation sides broadcast (aliased dims, filters pushed
    into each broadcast); the fact chain shuffles on orderkey then
    custkey; the final aggregate is tiny (2 directions × years)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    n1 = nat.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = nat.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    volume = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(12,2)")
    )
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(F.sum(volume).cast("double").alias("volume"))
    )


@register(
    "q12_ship_latency_priority",
    oracle="""
    SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60 THEN 'late'
                WHEN date_diff('day', o_orderdate, l_shipdate) > 30 THEN 'slow'
                ELSE 'fast' END AS latency_band,
           COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
             AS high_line_count,
           COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
             AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
    tags=("join", "agg", "case", "tpch"),
)
def q12_ship_latency_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts of urgent vs non-urgent
    orders per ship-latency band (CASE-derived grouping key + FILTER
    aggregates). One orderkey shuffle; the CASE and both conditional
    counts are map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lat = F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
    band = (
        F.when(lat > 60, "late").when(lat > 30, "slow").otherwise("fast")
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(band.alias("latency_band"))
        .agg(
            F.count(F.when(urgent, 1)).alias("high_line_count"),
            F.count(F.when(~urgent, 1)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue_share",
    oracle="""
    SELECT CAST(100.0 AS DOUBLE)
           * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2)))
                 ELSE 0 END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
             AS promo_revenue_pct,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE year(l_shipdate) = 1997
    GROUP BY ALL
    """,
    tags=("join", "agg", "tpch"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo-part revenue share for one ship year —
    conditional revenue over total revenue in a single aggregate (no
    second scan). Part broadcasts; the year filter pushes into the
    lineitem scan; exact decimal sums divided once at the end."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1997)
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(12,2)")
    )
    promo_rev = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0) * F.sum(promo_rev).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "skew_key_report",
    oracle="""
    SELECT l_suppkey AS key, COUNT(*) AS n_rows,
           CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM lineitem) AS share
    FROM lineitem
    GROUP BY 1
    ORDER BY n_rows DESC, key
    LIMIT 20
    """,
    tags=("skew", "diagnostics", "agg"),
)
def skew_key_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis: top-20 heavy hitters of a prospective
    shuffle key with their share of the table — the report that decides
    between plain shuffle, AQE skew-join, and explicit salting
    (operators.joins.salted_join / salted_join_hot_events).

    Scale: two-phase count + broadcast scalar total + top-k
    (TakeOrderedAndProject); one shuffle of (key, partial_count)."""
    li = load_table(spark, sf_dir, "lineitem")
    total = li.agg(F.count(F.lit(1)).alias("__total"))
    return (
        li.groupBy(F.col("l_suppkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .crossJoin(F.broadcast(total))
        .select(
            "key",
            "n_rows",
            (F.col("n_rows").cast("double") / F.col("__total")).alias("share"),
        )
        .orderBy(F.desc("n_rows"), F.asc("key"))
        .limit(20)
    )
