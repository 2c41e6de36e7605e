"""Data-quality audit queries — the constraint-check layer every
training-data / lakehouse pipeline runs before promoting a zone
(null rates, domain violations, key uniqueness, referential orphans).

The reference enforces its silver contract implicitly (cast-to-null +
fillna, reference jobs/silver_transformation.py:63-82) but never
REPORTS violations; these queries make the checks first-class, exact,
and cheap: ALL of a table's checks are conditional aggregates in one
agg() over one scan (the referential check rides the same scan through
a 1:1 broadcast left join), unpivoted to the report shape — auditing
100 TB costs one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rag_lakehouse_spark.functions import text as TX

from rag_lakehouse_spark.plans.registry import register
from rag_lakehouse_spark.sources.tables import load_table


@register(
    "dq_orders_report",
    oracle="""
    WITH base AS (
      SELECT 'null_orderdate' AS check_name,
             COUNT(*) FILTER (WHERE o_orderdate IS NULL) AS n_bad,
             COUNT(*) AS n_rows
      FROM orders
      UNION ALL
      SELECT 'nonpositive_price',
             COUNT(*) FILTER (WHERE o_totalprice <= 0), COUNT(*)
      FROM orders
      UNION ALL
      SELECT 'invalid_status',
             COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P')),
             COUNT(*)
      FROM orders
      UNION ALL
      SELECT 'duplicate_orderkey',
             COUNT(*) - COUNT(DISTINCT o_orderkey), COUNT(*)
      FROM orders
      UNION ALL
      SELECT 'orphan_custkey',
             COUNT(*) FILTER (WHERE c_custkey IS NULL), COUNT(*)
      FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    )
    SELECT check_name, n_bad, n_rows,
           CAST(n_bad AS DOUBLE) / n_rows AS violation_rate
    FROM base
    """,
    tags=("quality", "audit", "agg"),
)
def dq_orders_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit over orders: null rate, value domain, status
    domain, key uniqueness, and customer referential integrity — one
    row per check with exact violation counts.

    Scale: ALL five checks ride one scan — a single agg() over
    orders LEFT-broadcast-JOIN customer (the join is 1:1 on the
    customer primary key, so the row multiset and every per-order
    check are unchanged) emits one wide row of conditional aggregates,
    and ``stack`` unpivots it to the report shape. Auditing 100 TB
    costs one pass, exactly as advertised.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
    wide = j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("o_orderdate").isNull(), 1)).alias("null_orderdate"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("nonpositive_price"),
        F.count(F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)).alias(
            "invalid_status"
        ),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("duplicate_orderkey"),
        F.count(F.when(F.col("c_custkey").isNull(), 1)).alias("orphan_custkey"),
    )
    return wide.selectExpr(
        "stack(5, 'null_orderdate', null_orderdate,"
        " 'nonpositive_price', nonpositive_price,"
        " 'invalid_status', invalid_status,"
        " 'duplicate_orderkey', duplicate_orderkey,"
        " 'orphan_custkey', orphan_custkey) AS (check_name, n_bad)",
        "n_rows",
    ).select(
        "check_name",
        "n_bad",
        "n_rows",
        (F.col("n_bad").cast("double") / F.col("n_rows")).alias("violation_rate"),
    )


@register(
    "dq_documents_report",
    oracle="""
    WITH base AS (
      SELECT 'empty_text' AS check_name,
             COUNT(*) FILTER (WHERE text IS NULL OR length(regexp_replace(text, '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g')) = 0) AS n_bad,
             COUNT(*) AS n_rows
      FROM documents
      UNION ALL
      SELECT 'bad_char_count',
             COUNT(*) FILTER (WHERE n_chars <> length(text)), COUNT(*)
      FROM documents
      UNION ALL
      SELECT 'unknown_lang',
             COUNT(*) FILTER (WHERE lang NOT IN ('en', 'de', 'fr', 'es', 'zh')),
             COUNT(*)
      FROM documents
      UNION ALL
      SELECT 'duplicate_doc_id',
             COUNT(*) - COUNT(DISTINCT doc_id), COUNT(*)
      FROM documents
    )
    SELECT check_name, n_bad, n_rows,
           CAST(n_bad AS DOUBLE) / n_rows AS violation_rate
    FROM base
    """,
    tags=("quality", "audit", "text"),
)
def dq_documents_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-side quality audit: empty documents, metadata/content
    drift (n_chars vs actual length), language-tag domain, id
    uniqueness — the gate a training corpus passes before tokenization
    spend. True one-scan: a single agg() emits one wide row of
    conditional aggregates; ``stack`` unpivots to the report shape."""
    d = load_table(spark, sf_dir, "documents")
    empty = F.col("text").isNull() | (F.length(TX.edge_trim(F.col("text"))) == 0)
    wide = d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(empty, 1)).alias("empty_text"),
        F.count(F.when(F.col("n_chars") != F.length("text"), 1)).alias("bad_char_count"),
        F.count(F.when(~F.col("lang").isin("en", "de", "fr", "es", "zh"), 1)).alias(
            "unknown_lang"
        ),
        (F.count(F.lit(1)) - F.countDistinct("doc_id")).alias("duplicate_doc_id"),
    )
    return wide.selectExpr(
        "stack(4, 'empty_text', empty_text,"
        " 'bad_char_count', bad_char_count,"
        " 'unknown_lang', unknown_lang,"
        " 'duplicate_doc_id', duplicate_doc_id) AS (check_name, n_bad)",
        "n_rows",
    ).select(
        "check_name",
        "n_bad",
        "n_rows",
        (F.col("n_bad").cast("double") / F.col("n_rows")).alias("violation_rate"),
    )


@register(
    "dq_skew_report",
    oracle="""
    WITH g1 AS (
      SELECT user_id AS k, COUNT(*) AS c FROM events
      WHERE user_id IS NOT NULL GROUP BY 1
    ), g2 AS (
      SELECT o_custkey AS k, COUNT(*) AS c FROM orders GROUP BY 1
    ), s1 AS (
      SELECT 'events.user_id' AS key_col,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(MAX(c) AS BIGINT) AS max_rows,
             quantile_cont(c, 0.5) AS p50_rows,
             quantile_cont(c, 0.99) AS p99_rows,
             CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS BIGINT) AS top_key_share
      FROM g1
    ), s2 AS (
      SELECT 'orders.o_custkey',
             CAST(COUNT(*) AS BIGINT),
             CAST(MAX(c) AS BIGINT),
             quantile_cont(c, 0.5),
             quantile_cont(c, 0.99),
             CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS BIGINT)
      FROM g2
    )
    SELECT * FROM s1 UNION ALL SELECT * FROM s2
    """,
    tags=("dq", "skew", "diagnostics"),
)
def dq_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew diagnostics — the measurement that DECIDES
    when to salt (``salted_join_hot_events``) or trust AQE skew
    splitting: per hot key column, the group-count distribution
    (n_keys, max, exact p50/p99 of rows-per-key) and the share of the
    table owned by the single hottest key.

    Scale: one groupBy per key column (map-side combined — the shuffle
    carries one row per key), then a tiny percentile aggregate over
    the group sizes. This is the cheap pre-flight a pipeline runs
    before choosing a join strategy at 100 TB."""

    def stats(df: DataFrame, key: str, label: str) -> DataFrame:
        g = (
            df.filter(F.col(key).isNotNull())
            .groupBy(F.col(key).alias("k"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        return g.agg(
            F.lit(label).alias("key_col"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.max("c").cast("bigint").alias("max_rows"),
            F.percentile("c", 0.5).alias("p50_rows"),
            F.percentile("c", 0.99).alias("p99_rows"),
            (F.max("c").cast("double") / F.sum("c").cast("bigint")).alias(
                "top_key_share"
            ),
        )
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    return stats(e, "user_id", "events.user_id").unionByName(
        stats(o, "o_custkey", "orders.o_custkey")
    )


@register(
    "dq_source_drift_ks",
    oracle="""
    WITH pc AS (
      SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2
    ), vals AS (
      SELECT DISTINCT n_chars FROM documents
    ), srcs AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s FROM documents GROUP BY 1
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents
    ), gv AS (
      SELECT n_chars,
             CAST(SUM(c2) OVER (ORDER BY n_chars) AS BIGINT) AS cum_all
      FROM (SELECT n_chars, SUM(c) AS c2 FROM pc GROUP BY 1)
    ), grid AS (
      SELECT s.source, v.n_chars FROM (SELECT source FROM srcs) s, vals v
    ), cs AS (
      SELECT g.source, g.n_chars,
             CAST(SUM(COALESCE(pc.c, 0))
                  OVER (PARTITION BY g.source ORDER BY g.n_chars) AS BIGINT)
               AS cum_s
      FROM grid g
      LEFT JOIN pc ON pc.source = g.source AND pc.n_chars = g.n_chars
    )
    SELECT cs.source,
           MAX(srcs.n_s) AS n_docs,
           MAX(abs(CAST(cum_s AS DOUBLE) / srcs.n_s
                   - CAST(gv.cum_all - cum_s AS DOUBLE) / (tot.n - srcs.n_s)))
             AS ks
    FROM cs
    JOIN gv USING (n_chars)
    JOIN srcs ON srcs.source = cs.source, tot
    WHERE tot.n > srcs.n_s
    GROUP BY cs.source
    """,
    tags=("quality", "drift", "distribution", "training-data"),
)
def dq_source_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov drift statistic, per source
    vs the rest of the corpus, over the document-length distribution —
    the distribution-level monitor that catches a source silently
    changing shape (new scraper, truncation bug, template shift) when
    its row counts and null rates still look healthy.

    D = sup_x |F_source(x) - F_rest(x)|, evaluated at every observed
    jump point. Each CDF ratio is one division of exact integer
    cumulative counts — identical doubles in both engines — and MAX is
    order-independent, so the statistic is hash-exact with no overflow
    surface at any corpus size (the cross-multiplied integer form
    would overflow int64 past ~3e9 docs; the ratio form never does).

    Scale: the windows run over the (source × distinct-length) GRID,
    never raw rows — bounded by the length domain (the quality gate
    caps docs at 20k chars) times the source count, whatever the
    corpus size. The raw table contributes one groupBy. The
    unpartitioned cum_all window is over ≤ |length domain| aggregate
    rows — the documented bounded-domain window rationale."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    pc = d.groupBy("source", "n_chars").agg(F.count(F.lit(1)).alias("c"))
    vals = d.select("n_chars").distinct()
    srcs = d.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_s"))
    tot = d.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    gv = (
        d.groupBy("n_chars")
        .agg(F.count(F.lit(1)).alias("c2"))
        .withColumn(
            "cum_all",
            F.sum("c2").over(W.orderBy("n_chars")).cast("bigint"),
        )
        .select("n_chars", "cum_all")
    )
    grid = srcs.select("source").crossJoin(vals)
    cs = grid.join(pc, ["source", "n_chars"], "left").withColumn(
        "cum_s",
        F.sum(F.coalesce(F.col("c"), F.lit(0)))
        .over(W.partitionBy("source").orderBy("n_chars"))
        .cast("bigint"),
    )
    j = (
        cs.join(gv, "n_chars")
        .join(F.broadcast(srcs), "source")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("n") > F.col("n_s"))
    )
    gap = F.abs(
        F.col("cum_s").cast("double") / F.col("n_s")
        - (F.col("cum_all") - F.col("cum_s")).cast("double")
        / (F.col("n") - F.col("n_s"))
    )
    return j.groupBy("source").agg(
        F.max("n_s").cast("bigint").alias("n_docs"),
        F.max(gap).alias("ks"),
    )


@register(
    "dq_source_psi",
    oracle="""
    WITH edges AS (
      SELECT quantile_cont(n_chars, 0.1) AS e1, quantile_cont(n_chars, 0.2) AS e2,
             quantile_cont(n_chars, 0.3) AS e3, quantile_cont(n_chars, 0.4) AS e4,
             quantile_cont(n_chars, 0.5) AS e5, quantile_cont(n_chars, 0.6) AS e6,
             quantile_cont(n_chars, 0.7) AS e7, quantile_cont(n_chars, 0.8) AS e8,
             quantile_cont(n_chars, 0.9) AS e9
      FROM documents
    ), binned AS (
      SELECT source,
             1 + (CASE WHEN n_chars > e1 THEN 1 ELSE 0 END)
               + (CASE WHEN n_chars > e2 THEN 1 ELSE 0 END)
               + (CASE WHEN n_chars > e3 THEN 1 ELSE 0 END)
               + (CASE WHEN n_chars > e4 THEN 1 ELSE 0 END)
               + (CASE WHEN n_chars > e5 THEN 1 ELSE 0 END)
               + (CASE WHEN n_chars > e6 THEN 1 ELSE 0 END)
               + (CASE WHEN n_chars > e7 THEN 1 ELSE 0 END)
               + (CASE WHEN n_chars > e8 THEN 1 ELSE 0 END)
               + (CASE WHEN n_chars > e9 THEN 1 ELSE 0 END) AS bin
      FROM documents, edges
    ), sb AS (
      SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS n_sb
      FROM binned GROUP BY 1, 2
    ), gb AS (
      SELECT bin, CAST(SUM(n_sb) AS BIGINT) AS n_gb FROM sb GROUP BY 1
    ), srcs AS (
      SELECT source, CAST(SUM(n_sb) AS BIGINT) AS n_s FROM sb GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(n_gb) AS BIGINT) AS n FROM gb
    ), terms AS (
      SELECT sb.source, sb.bin,
             CASE WHEN sb.n_sb = 0 OR gb.n_gb - sb.n_sb = 0 THEN 0e0
                  ELSE (CAST(sb.n_sb AS DOUBLE) / srcs.n_s
                        - CAST(gb.n_gb - sb.n_sb AS DOUBLE) / (tot.n - srcs.n_s))
                       * round(ln((CAST(sb.n_sb AS DOUBLE) / srcs.n_s)
                                  / (CAST(gb.n_gb - sb.n_sb AS DOUBLE)
                                     / (tot.n - srcs.n_s))), 9)
             END AS term
      FROM sb
      JOIN gb USING (bin)
      JOIN srcs ON srcs.source = sb.source, tot
      WHERE tot.n > srcs.n_s
    )
    SELECT source,
           list_reduce(list_prepend(0e0, array_agg(term ORDER BY bin)),
                       (a, b) -> a + b) AS psi
    FROM terms GROUP BY source
    """,
    tags=("quality", "drift", "distribution", "training-data"),
)
def dq_source_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per source vs the rest of the corpus
    over the document-length distribution — THE standard production
    drift alarm (PSI < 0.1 stable, > 0.25 action), complementing the
    KS sup-statistic with a mass-weighted whole-distribution view.

    Bins are the corpus's own deciles (exact percentiles over the
    bounded integer length domain, broadcast); bin membership is an
    integer-vs-edge compare. Each bin term is
    (p_b − q_b)·ln(p_b/q_b) with the standing 9-decimal ln rounding
    (the one transcendental), and the 10 terms fold in BIN ORDER on
    both engines (Spark ``aggregate`` over the bin-sorted array ==
    DuckDB ``list_reduce`` over ``array_agg(ORDER BY bin)``) — the
    dynamic-float-sum rule, since a plain SUM's addition order is
    engine-dependent. Bins empty on either side contribute 0 by the
    documented convention.

    Scale: one (source × 10-bin) aggregate; everything after is
    |sources|-sized. The edge aggregate buffers the bounded length
    domain, per the r8 percentile rule."""
    from pyspark.sql import Window as W  # noqa: F401  (parallel with KS imports)

    d = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    edges = d.agg(
        *[
            F.percentile("n_chars", q / 10).alias(f"e{q}")
            for q in range(1, 10)
        ]
    )
    bin_col = F.lit(1)
    for q in range(1, 10):
        bin_col = bin_col + F.when(F.col("n_chars") > F.col(f"e{q}"), 1).otherwise(0)
    binned = d.crossJoin(F.broadcast(edges)).select(
        "source", bin_col.alias("bin")
    )
    # sb feeds the global-bin rollup, the per-source totals, AND the
    # term join — barrier per the multi-consumer rule (tiny table)
    sb = (
        binned.groupBy("source", "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sb"))
        .localCheckpoint(eager=True)
    )
    gb = sb.groupBy("bin").agg(F.sum("n_sb").cast("bigint").alias("n_gb"))
    srcs = sb.groupBy("source").agg(F.sum("n_sb").cast("bigint").alias("n_s"))
    tot = gb.agg(F.sum("n_gb").cast("bigint").alias("n"))
    j = (
        sb.join(F.broadcast(gb), "bin")
        .join(F.broadcast(srcs), "source")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("n") > F.col("n_s"))
    )
    p = F.col("n_sb").cast("double") / F.col("n_s")
    qq = (F.col("n_gb") - F.col("n_sb")).cast("double") / (F.col("n") - F.col("n_s"))
    term = F.when(
        (F.col("n_sb") == 0) | (F.col("n_gb") - F.col("n_sb") == 0), F.lit(0.0)
    ).otherwise((p - qq) * F.round(F.log(p / qq), 9))
    packed = (
        j.select("source", "bin", term.alias("term"))
        .groupBy("source")
        .agg(F.array_sort(F.collect_list(F.struct("bin", "term"))).alias("ts"))
    )
    return packed.select(
        "source",
        F.aggregate(
            F.col("ts"), F.lit(0.0), lambda a, s: a + s["term"]
        ).alias("psi"),
    )


def _hashed_features_oracle() -> str:
    from rag_lakehouse_spark.operators.dedup_portable import duckdb_base60

    toks = (
        "list_filter(regexp_split_to_array("
        + TX.duckdb_edge_trim("lower(coalesce(text, ''))")
        + f", '{TX.DUCKDB_WS}'), x -> x <> '')"
    )
    h = duckdb_base60("t")
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest({toks}) AS t FROM documents
    ), hb AS (
      SELECT doc_id,
             CAST({h} % 64 AS INT) AS bucket,
             CASE WHEN (({h} >> 6) & 1) = 1 THEN 1 ELSE -1 END AS sgn
      FROM tok
    )
    SELECT doc_id, bucket, CAST(SUM(sgn) AS BIGINT) AS feat
    FROM hb GROUP BY doc_id, bucket
    """


@register(
    "text_hashed_features",
    oracle=None,  # set below (builder needs TX helpers at import time)
    tags=("text", "features", "ml", "portable-twin"),
)
def text_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the Weinberger et al. hashing trick) — the
    scalable bag-of-words featurizer a corpus-scale quality/domain
    classifier consumes (the fastText/CCNet-style filtering stage):
    each token hashes to one of 64 buckets via the portable 60-bit
    hash, contributes ±1 by a second hash bit (sign hashing keeps the
    expectation of collision noise zero), and per-document bucket
    sums form the sparse feature rows (doc_id, bucket, feat). No
    vocabulary is built or broadcast — the defining property that
    makes the featurizer embarrassingly parallel at any corpus size.
    All-integer arithmetic; hash-checked end-to-end.

    Scale: one explode → groupBy (doc_id, bucket) with map-side
    partials; output is ≤64 rows per document regardless of doc
    length; no join, no vocabulary state. Raising k to 2^18 (the
    usual classifier width) changes the modulus only."""
    from rag_lakehouse_spark.operators.dedup_portable import base60

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(
            F.split(
                TX.edge_trim(F.lower(F.coalesce(F.col("text"), F.lit("")))),
                TX.WS,
            )
        ).alias("t"),
    ).filter(F.col("t") != "")
    h = base60(F.col("t"))
    hb = tok.select(
        "doc_id",
        (h % 64).cast("int").alias("bucket"),
        F.when(F.shiftright(h, 6).bitwiseAND(F.lit(1)) == 1, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("sgn"),
    )
    return hb.groupBy("doc_id", "bucket").agg(
        F.sum("sgn").cast("bigint").alias("feat")
    )


from rag_lakehouse_spark.plans import registry as _registry  # noqa: E402

_registry.QUERIES["text_hashed_features"].oracle = _hashed_features_oracle()


def _quality_classifier_oracle() -> str:
    from rag_lakehouse_spark.operators.dedup_portable import duckdb_base60

    toks = (
        "list_filter(regexp_split_to_array("
        + TX.duckdb_edge_trim("lower(coalesce(text, ''))")
        + f", '{TX.DUCKDB_WS}'), x -> x <> '')"
    )
    h = duckdb_base60("t")
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest({toks}) AS t FROM documents
    ), hb AS (
      SELECT doc_id,
             CAST({h} % 64 AS INT) AS bucket,
             CASE WHEN (({h} >> 6) & 1) = 1 THEN 1 ELSE -1 END AS sgn
      FROM tok
    ), feats AS (
      SELECT doc_id, bucket, CAST(SUM(sgn) AS BIGINT) AS feat
      FROM hb GROUP BY doc_id, bucket
    ), scored AS (
      SELECT f.doc_id,
             CAST(SUM(f.feat * ((CAST(f.bucket AS BIGINT) * 2654435761
                                 + 12345) % 1001 - 500)) AS BIGINT)
               AS score_q
      FROM feats f GROUP BY f.doc_id
    )
    SELECT d.doc_id,
           coalesce(s.score_q, 0) AS score_q,
           CAST(coalesce(s.score_q, 0) AS DOUBLE) / 1000e0 AS score,
           coalesce(s.score_q, 0) >= 0 AS keep
    FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id
    """


@register(
    "text_quality_classifier",
    oracle=None,  # set below with the other builder-needing oracles
    tags=("text", "quality", "ml", "classifier", "portable-twin"),
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality classifier over hashed features — the scoring +
    gating half of the fastText/CCNet-style filtering stage whose
    featurizer is ``text_hashed_features``: each document's 64 sign-
    hashed bucket sums dot a FROZEN integer weight vector
    ``w(b) = (b·2654435761 + 12345) % 1001 - 500`` (the deterministic
    stand-in for trained classifier weights — a real model swaps in a
    64-row broadcast weight table, plans unchanged), giving an exact
    int64 margin ``score_q``; the only double is the final /1000
    display scale, and the keep/drop gate is the integer sign. Every
    document emits a row (token-less docs score 0 via the LEFT join)
    so the gate partitions the corpus exactly.

    The margin is hash-checked end-to-end through tokenize → sign-hash
    → bucket-sum → dot — a wrong sign bit, bucket modulus, or weight
    formula in either engine breaks it.

    Scale: one explode → (doc, bucket) aggregate with map-side
    partials → per-doc dot as a second bounded aggregate (≤64 rows per
    doc); weights are an EXPRESSION of the bucket id, so there is no
    vocabulary or weight state at all — the same property that lets
    the featurizer scale. A trained 2^18-bucket model broadcasts its
    weight table; nothing else changes.

    Reference parity: beyond the reference (its silver layer gates on
    length/null rules only, jobs/silver_transformation.py:18-134) —
    training-data-pipeline quality scoring."""
    from rag_lakehouse_spark.operators.dedup_portable import base60

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(
            F.split(
                TX.edge_trim(F.lower(F.coalesce(F.col("text"), F.lit("")))),
                TX.WS,
            )
        ).alias("t"),
    ).filter(F.col("t") != "")
    h = base60(F.col("t"))
    feats = (
        tok.select(
            "doc_id",
            (h % 64).cast("int").alias("bucket"),
            F.when(F.shiftright(h, 6).bitwiseAND(F.lit(1)) == 1, F.lit(1))
            .otherwise(F.lit(-1))
            .alias("sgn"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.sum("sgn").cast("bigint").alias("feat"))
    )
    w = (
        F.col("bucket").cast("bigint") * F.lit(2654435761).cast("bigint")
        + F.lit(12345)
    ) % 1001 - 500
    scored = feats.groupBy("doc_id").agg(
        F.sum(F.col("feat") * w).cast("bigint").alias("score_q")
    )
    return (
        d.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("score_q", F.lit(0)).cast("bigint").alias("score_q"),
            (F.coalesce("score_q", F.lit(0)).cast("double") / F.lit(1000.0)).alias(
                "score"
            ),
            (F.coalesce("score_q", F.lit(0)) >= 0).alias("keep"),
        )
    )


_registry.QUERIES["text_quality_classifier"].oracle = _quality_classifier_oracle()


_ENCODING_ORACLE = """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_replacement,
           CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_mojibake,
           CAST(SUM(CASE WHEN doc_id % 11 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_control,
           CAST(SUM(CASE WHEN doc_id % 7 <> 0 AND doc_id % 5 <> 0
                          AND doc_id % 11 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clean,
           CAST(SUM(CASE WHEN doc_id % 7 <> 0 AND doc_id % 5 <> 0
                          AND doc_id % 11 <> 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS clean_share
    FROM documents
    GROUP BY source
    """


@register(
    "text_encoding_quality",
    oracle=_ENCODING_ORACLE,
    tags=("quality", "text", "encoding"),
)
def text_encoding_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-health report -- the corpus triage a training pipeline
    runs before tokenization: per source, how many documents carry a
    U+FFFD replacement character (a decoder already gave up), classic
    UTF-8-read-as-cp1252 mojibake digraphs, or raw C0 control bytes.
    The detectors (functions/text.py: has_replacement_char /
    has_mojibake_markers / has_raw_control_chars) are REAL regexes run
    over the text; known defects are INJECTED from closed doc_id
    formulas (append U+FFFD when doc_id%7==0, an \u00e2\u20ac\u2122
    mojibake when %5==0, a BEL when %11==0 -- the synth-writer pattern
    from the media family applied to text), and the oracle recomputes
    every count from the formulas alone -- a detector with a false
    positive on clean corpus text or a miss on an injected defect
    breaks the hash.

    Scale: one scan, conditional aggregates only -- the same
    single-pass audit shape as the dq_* family; the regexes are
    JVM-side RLIKE (no UDF).

    Reference parity: the reference's silver step strips whitespace
    variants only (jobs/silver_transformation.py:63-82); encoding
    health is the audit it needs before multilingual scale-up."""
    from rag_lakehouse_spark.streaming.rollup_sink import _encoding_partials

    # the SAME inject+detect+aggregate the streaming twin folds per
    # batch — one counter definition, so the twins cannot drift
    d = load_table(spark, sf_dir, "documents")
    return _encoding_partials(d).select(
        "source",
        "n_docs",
        "n_replacement",
        "n_mojibake",
        "n_control",
        "n_clean",
        (F.col("n_clean").cast("double") / F.col("n_docs")).alias(
            "clean_share"
        ),
    )


@register(
    "text_encoding_incremental",
    oracle=_ENCODING_ORACLE,  # shared with the batch twin
    tags=("quality", "text", "encoding", "streaming"),
)
def text_encoding_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The encoding-health report served from STREAMING-MAINTAINED
    counters — the TENTH incremental-index family: documents replay
    through an availableNow file stream (4 files, ≥4 micro-batches),
    each batch folding its per-source counter partials into versioned
    state via the rollup sink's fold machinery. The inject+detect step
    is the SAME function the batch report aggregates
    (``operators.text.encoding_defect_flags``), counter SUMS are
    mergeable, and the fold watermark makes at-least-once replay
    exactly-once (SUM merge class), so the maintained counters equal
    the one-shot report however ingestion was batched — the SHARED
    oracle hash-checks it externally. State is compacted post-stream
    and served from the post-compaction read (same contract as
    ``events_hll_incremental``).

    Scale: per-increment cost is one micro-batch regex scan + a
    |sources|-row state merge; history text is never re-scanned —
    continuous encoding-health monitoring for a crawl firehose."""
    import os
    import shutil
    import tempfile

    from rag_lakehouse_spark.streaming.rollup_sink import (
        compact_fold_state,
        maintain_encoding_counters,
        read_encoding_counters,
    )

    base = tempfile.mkdtemp(prefix="rls_enc_stream_")
    try:
        src = os.path.join(base, "documents")
        d = load_table(spark, sf_dir, "documents")
        d.select("doc_id", "text", "source").repartition(4).write.mode(
            "overwrite"
        ).parquet(src)
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(base, "encoding_counters")
        maintain_encoding_counters(spark, stream, state).awaitTermination()
        assert compact_fold_state(spark, state)  # offline maintenance
        counters = read_encoding_counters(spark, state)
        return counters.select(
            "source",
            "n_docs",
            "n_replacement",
            "n_mojibake",
            "n_control",
            "n_clean",
            (
                F.col("n_clean").cast("double") / F.col("n_docs")
            ).alias("clean_share"),
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
