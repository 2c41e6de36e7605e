"""Scalar-function surface breadth: extended string ops, regexp_extract_all,
date/interval arithmetic, null-handling primitives, min_by/max_by
aggregates, bitwise ops, null-safe equality — each aligned with its
DuckDB twin for exact differential checking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rag_lakehouse_spark.plans.registry import register
from rag_lakehouse_spark.sources.tables import load_table


@register(
    "string_extended_funcs",
    oracle="""
    SELECT p_partkey,
           lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
           reverse(p_brand) AS brand_rev,
           repeat('-', p_size % 5) AS size_bar,
           replace(p_type, ' ', '_') AS type_snake,
           left(p_name, 5) AS name_head,
           right(p_name, 5) AS name_tail,
           position('a' IN p_name) AS first_a,
           split_part(p_type, ' ', 1) AS type_first_word,
           CASE WHEN p_name ILIKE '%steel%' THEN 1 ELSE 0 END AS mentions_steel
    FROM part WHERE p_partkey < 400
    """,
    tags=("string",),
)
def string_extended_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string surface: pad/reverse/repeat/replace/left/right/
    instr/split_part/ilike."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 400)
    return p.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.lit("-"), (F.col("p_size") % 5).cast("int")).alias("size_bar"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.col("p_name").substr(F.length("p_name") - 4, F.lit(5)).alias("name_tail"),
        F.instr("p_name", "a").alias("first_a"),
        F.split_part("p_type", F.lit(" "), F.lit(1)).alias("type_first_word"),
        F.when(F.col("p_name").ilike("%steel%"), 1).otherwise(0).alias("mentions_steel"),
    )


@register(
    "regexp_extract_all_tokens",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '([a-z]{6,})', 1)) AS n_long_words,
           COALESCE(array_to_string(regexp_extract_all(text, '([a-z]{8,})', 1)[1:3], '|'), '')
             AS first_long,
           regexp_matches(text, 'join|merge') AS mentions_join
    FROM documents WHERE doc_id < 200
    """,
    tags=("string", "regex"),
)
def regexp_extract_all_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all + rlike over the corpus."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("([a-z]{6,})"), 1)).alias("n_long_words"),
        F.array_join(
            F.slice(F.regexp_extract_all("text", F.lit("([a-z]{8,})"), 1), 1, 3), "|"
        ).alias("first_long"),
        F.col("text").rlike("join|merge").alias("mentions_join"),
    )


@register(
    "date_interval_arithmetic",
    oracle="""
    SELECT o_orderkey,
           -- integer day add (not INTERVAL 90 DAY): DuckDB expression CSE
           -- compares intervals with 1-month==30-day normalization, so
           -- INTERVAL 90 DAY and INTERVAL 3 MONTH in one SELECT collapse
           -- into one expression
           strftime(CAST(o_orderdate AS DATE) + 90, '%Y-%m-%d') AS due_date,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS quarter_out,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start,
           quarter(o_orderdate) AS q,
           dayofweek(CAST(o_orderdate AS DATE)) AS dow_sunday0,
           weekofyear(CAST(o_orderdate AS DATE)) AS iso_week
    FROM orders WHERE o_orderkey < 800
    """,
    tags=("date", "interval"),
)
def date_interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic + calendar functions. DuckDB dayofweek is
    Sunday=0; Spark dayofweek is Sunday=1 → aligned with -1."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 800)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_add(d.cast("date"), 90), "yyyy-MM-dd").alias("due_date"),
        F.date_format(F.add_months(d.cast("date"), 3), "yyyy-MM-dd").alias("quarter_out"),
        F.date_format(F.last_day(d.cast("date")), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_trunc("week", d), "yyyy-MM-dd").alias("week_start"),
        F.quarter(d).alias("q"),
        (F.dayofweek(d.cast("date")) - 1).alias("dow_sunday0"),
        F.weekofyear(d.cast("date")).alias("iso_week"),
    )


@register(
    "null_handling_funcs",
    oracle="""
    SELECT event_id,
           NULLIF(event_type, 'error') AS type_or_null,
           COALESCE(NULLIF(event_type, 'error'), 'recovered') AS type_repaired,
           (value IS NOT DISTINCT FROM 0.0) AS is_exactly_zero,
           CASE WHEN value > 100 THEN NULL ELSE value END AS value_capped,
           IFNULL(TRY_CAST(json_extract_string(props, '$.missing') AS INT), -1)
             AS missing_prop
    FROM events WHERE event_id < 2000
    """,
    tags=("null", "conditional"),
)
def null_handling_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling primitives: nullif / coalesce / null-safe equality
    (<=> ↔ IS NOT DISTINCT FROM) / ifnull."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return e.select(
        "event_id",
        F.nullif("event_type", F.lit("error")).alias("type_or_null"),
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("recovered")).alias(
            "type_repaired"
        ),
        F.col("value").eqNullSafe(F.lit(0.0)).alias("is_exactly_zero"),
        F.when(F.col("value") > 100, F.lit(None)).otherwise(F.col("value")).alias(
            "value_capped"
        ),
        F.ifnull(
            F.get_json_object("props", "$.missing").try_cast("int"), F.lit(-1)
        ).alias("missing_prop"),
    )


@register(
    "minby_maxby_agg",
    oracle="""
    SELECT c_mktsegment,
           arg_min(c_name, c_acctbal) AS poorest_customer,
           arg_max(c_name, c_acctbal) AS richest_customer,
           MIN(c_acctbal) AS min_bal,
           MAX(c_acctbal) AS max_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("agg", "argminmax"),
)
def minby_maxby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by (arg-extrema) aggregates. Deterministic here:
    c_acctbal ties don't occur within a segment (asserted by the oracle
    match itself — a tie would surface as a value mismatch)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.min_by("c_name", "c_acctbal").alias("poorest_customer"),
        F.max_by("c_name", "c_acctbal").alias("richest_customer"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
    )


@register(
    "bitwise_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey & 255 AS low_byte,
           l_orderkey | 4096 AS with_flag,
           xor(l_orderkey, l_partkey) AS key_xor,
           l_orderkey << 2 AS shifted_l,
           l_orderkey >> 3 AS shifted_r,
           bit_count(l_orderkey) AS popcount
    FROM lineitem WHERE l_orderkey < 300
    """,
    tags=("bitwise",),
)
def bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator surface (and/or/xor/shifts/popcount) — the
    primitives under SimHash/LSH banding."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    k = F.col("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.col("l_partkey")).alias("key_xor"),
        F.shiftleft(k, 2).alias("shifted_l"),
        F.shiftright(k, 3).alias("shifted_r"),
        F.bit_count(k).alias("popcount"),
    )


@register(
    "xpath_multi_fallback",
    oracle="""
    SELECT p_partkey,
           p_name AS extracted_name,
           p_brand AS extracted_brand,
           p_size AS extracted_size,
           CASE WHEN p_partkey % 2 = 0 THEN 'name' ELSE 'title' END AS matched_tag
    FROM part
    WHERE p_partkey < 500
    """,
    tags=("xpath", "string", "extract"),
)
def xpath_multi_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-XPath fallback extraction (SURVEY §2.1 S2): the reference
    scrapes each field by trying a LIST of XPaths first-match-wins
    (reference config/config.py:32 BOOK_DETAILS_XPATH lists;
    jobs/scraper.py:161-166 fallback loop). Spark-first that is the
    built-in JVM ``xpath_*`` family over an XML column plus a
    coalesce(nullif(...)) chain — no Python, fully codegen.

    The XML document is synthesized row-side with a layout that DRIFTS
    by row (even part keys use <name>, odd use <title> — the page-
    variant situation the fallback lists exist for), then parsed back
    through the real XPath engine. The oracle is the round-trip
    identity: extraction must return exactly the embedded fields.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    name_el = F.when(
        F.col("p_partkey") % 2 == 0,
        F.concat(F.lit("<name>"), F.col("p_name"), F.lit("</name>")),
    ).otherwise(F.concat(F.lit("<title>"), F.col("p_name"), F.lit("</title>")))
    xml = F.concat(
        F.lit("<product>"),
        name_el,
        F.lit("<brand>"), F.col("p_brand"), F.lit("</brand>"),
        F.lit("<size>"), F.col("p_size").cast("string"), F.lit("</size>"),
        F.lit("</product>"),
    )
    doc = p.select("p_partkey", xml.alias("__xml"))

    def xp(path: str):
        # xpath_string yields '' (not NULL) on no-match → nullif guards
        # the fallback chain exactly like the reference's `if value:`.
        return F.nullif(F.expr(f"xpath_string(__xml, '{path}')"), F.lit(""))

    return doc.select(
        "p_partkey",
        F.coalesce(xp("/product/name"), xp("/product/title")).alias("extracted_name"),
        xp("/product/brand").alias("extracted_brand"),
        F.expr("xpath_int(__xml, '/product/size')").alias("extracted_size"),
        F.when(xp("/product/name").isNotNull(), "name")
        .otherwise("title")
        .alias("matched_tag"),
    )


@register(
    "map_funcs_events",
    oracle="""
    SELECT event_id,
           'k,type,uid' AS keys_sorted,
           CAST(3 AS INTEGER) AS n_entries,
           json_extract_string(props, '$.k') AS k_val,
           event_type AS type_val,
           CAST(2 AS INTEGER) AS n_non_uid
    FROM events
    WHERE event_id < 200
    """,
    tags=("map", "scalar", "json"),
)
def map_funcs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: build a map<string,string> per event
    (create_map of literals/columns ⊎ from_json of the props JSON via
    map_concat), then read it back with map_keys / element_at /
    map_filter / size. The oracle states the expected values directly
    (the map is constructed in-plan, so its contents are derivable
    without map types in DuckDB) — the hash check proves Spark's map
    operators produce them.

    Scale: pure codegen map expressions, no shuffle."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    m = F.map_concat(
        F.create_map(
            F.lit("type"), F.col("event_type"),
            F.lit("uid"), F.col("user_id").cast("string"),
        ),
        F.from_json("props", "map<string,string>"),
    )
    return e.select(
        "event_id",
        # joined to a single string (not array<string>): the external
        # driver canonicalizes via pandas sort_values, which cannot
        # factorize list-valued cells (r4/r5 driver error).
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.size(m).alias("n_entries"),
        F.element_at(m, "k").alias("k_val"),
        F.element_at(m, "type").alias("type_val"),
        F.size(F.map_filter(m, lambda k, _v: k != "uid")).alias("n_non_uid"),
    )


@register(
    "variant_json_events",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
           CAST(json_extract(props, '$.k') AS VARCHAR) AS k_str,
           CAST(json_extract(props, '$.missing') AS INTEGER) AS missing_val
    FROM events
    WHERE event_id < 200
    """,
    tags=("variant", "json", "scalar"),
)
def variant_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT surface (Spark 4): parse the props JSON
    once into a variant and extract typed paths with variant_get —
    the open-schema ingestion path for heterogeneous JSON at scale
    (one binary-encoded column, no schema inference pass, pushdown-
    friendly shredding on newer writers).

    Scale: parse_json + variant_get are codegen expressions; at 100 TB
    variant beats from_json-with-declared-schema whenever the schema
    drifts (no job-restart on new fields)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k_int"),
        F.try_variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.missing", "int").alias("missing_val"),
    )
