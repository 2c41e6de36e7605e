"""Advanced operator coverage: as-of join, unpivot, grouping sets,
exact percentiles, range-frame windows, correlated subqueries, array
functions, and the vectorized/approximate operators (rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from rag_lakehouse_spark.functions import vector as VEC
from rag_lakehouse_spark.functions.text import WS as _WS
from rag_lakehouse_spark.functions.text import edge_trim as _edge_trim
from rag_lakehouse_spark.operators.asof import asof_join_backward
from rag_lakehouse_spark.operators.graph import bounded_path_counts
from rag_lakehouse_spark.plans.registry import register
from rag_lakehouse_spark.sources.tables import load_table, register_views


@register(
    "events_asof_purchase",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purch AS (
      SELECT event_id AS p_event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    )
    SELECT clicks.event_id,
           clicks.user_id,
           strftime(clicks.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           purch.p_event_id AS prev_purchase_id,
           purch.value AS prev_purchase_value
    FROM clicks ASOF LEFT JOIN purch
      ON clicks.user_id = purch.user_id AND purch.ts <= clicks.ts
    """,
    tags=("asof", "join", "events"),
)
def events_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each click is annotated with the user's most
    recent prior purchase (operator Spark lacks natively —
    operators.asof union+window implementation; oracled against
    DuckDB's native ASOF JOIN)."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purch = (
        e.filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("p_event_id"), "user_id", "ts", "value")
    )
    joined = asof_join_backward(
        clicks, purch, by="user_id", payload_cols=("p_event_id", "value")
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.col("right_p_event_id").alias("prev_purchase_id"),
        F.col("right_value").alias("prev_purchase_value"),
    )


@register(
    "unpivot_part_metrics",
    oracle="""
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS metric_value
    FROM part WHERE p_partkey < 500
    UNION ALL
    SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS metric_value
    FROM part WHERE p_partkey < 500
    """,
    tags=("unpivot",),
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long) via the built-in melt/unpivot operator —
    a Generate, no shuffle."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    ).unpivot("p_partkey", ["size", "retailprice"], "metric", "metric_value")


@register(
    "grouping_sets_revenue",
    oracle="""
    SELECT o_orderstatus, year(o_orderdate) AS order_year,
           GROUPING(o_orderstatus, year(o_orderdate)) AS grp_id,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (year(o_orderdate)), ())
    """,
    tags=("agg", "grouping-sets"),
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id — the general form of
    rollup/cube (SQL API; one Expand, one shuffle)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, year(o_orderdate) AS order_year,
               grouping_id(o_orderstatus, year(o_orderdate)) AS grp_id,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (year(o_orderdate)), ())
        """
    )


@register(
    "exact_percentiles_by_type",
    oracle="""
    SELECT event_type,
           quantile_cont(CAST(floor(value * 1000) AS BIGINT), 0.25) / 1000.0 AS p25,
           quantile_cont(CAST(floor(value * 1000) AS BIGINT), 0.5) / 1000.0 AS p50,
           quantile_cont(CAST(floor(value * 1000) AS BIGINT), 0.75) / 1000.0 AS p75,
           MIN(value) AS v_min,
           MAX(value) AS v_max
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "percentile"),
)
def exact_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles (Spark ``percentile`` ==
    DuckDB ``quantile_cont``) over a MILLI-QUANTIZED value grid:
    ``floor(value * 1000)`` (floor is engine-identical on doubles —
    never a double→int CAST, which truncates in Spark and rounds in
    DuckDB). Exact percentile buffers one entry per distinct input, so
    raw all-distinct doubles would buffer O(group size) at corpus scale
    (the VERDICT r7 #2 class); the integer grid bounds the buffer by
    the value domain × 1000 whatever the row count, at the price of
    0.001 resolution on the reported quantiles. min/max stay on the raw
    value (constant state). The approximate cousin
    (percentile_approx/KLL) is in approx_distinct_stats (rows-only:
    sketch internals differ across engines by design)."""
    e = load_table(spark, sf_dir, "events")
    q = F.floor(F.col("value") * 1000).cast("bigint")
    return e.groupBy("event_type").agg(
        (F.percentile(q, 0.25) / 1000.0).alias("p25"),
        (F.percentile(q, 0.5) / 1000.0).alias("p50"),
        (F.percentile(q, 0.75) / 1000.0).alias("p75"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
    )


@register(
    "window_range_frame_spend",
    oracle="""
    SELECT o_custkey, o_orderkey, day_no,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
                PARTITION BY o_custkey ORDER BY day_no
                RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS spend_30d
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS day_no
      FROM orders WHERE o_custkey < 200
    ) t
    """,
    tags=("window", "range-frame"),
)
def window_range_frame_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based window): trailing-30-day spend per
    customer. Time is projected to an integer day number so the frame
    is a numeric range — the portable form of interval range frames."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    day_no = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
    w = (
        W.partitionBy("o_custkey")
        .orderBy("day_no")
        .rangeBetween(-30, W.currentRow)
    )
    return o.withColumn("day_no", day_no).select(
        "o_custkey",
        "o_orderkey",
        "day_no",
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .over(w)
        .cast("double")
        .alias("spend_30d"),
    )


@register(
    "subquery_above_avg_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > (
        SELECT 2 * CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                 / COUNT(*)
        FROM orders o2 WHERE o2.o_custkey = o.o_custkey
    )
    """,
    tags=("subquery",),
)
def subquery_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders worth more than 2× the
    customer's own average. Catalyst decorrelates this into an
    aggregate + join — same plan the hand-written join would give."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM orders o
        WHERE o.o_totalprice > (
            SELECT 2 * CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                     / COUNT(*)
            FROM orders o2 WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@register(
    "array_funcs_tokens",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_sort(list_distinct(regexp_split_to_array(regexp_replace(text, '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'), '[ \t\n\x0B\f\r]+'))) AS tok
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           len(tok) AS n_distinct_tokens,
           array_to_string(tok[1:3], ',') AS first3,
           list_contains(tok, 'the') AS has_the,
           tok[1] AS first_token,
           tok[len(tok)] AS last_token
    FROM toks
    """,
    tags=("array",),
)
def array_funcs_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface: distinct, sort, slice, join, contains,
    element_at (1-based and last)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    tok = F.array_sort(F.array_distinct(F.split(_edge_trim("text"), _WS)))
    return d.select(
        "doc_id",
        F.size(tok).alias("n_distinct_tokens"),
        F.array_join(F.slice(tok, 1, 3), ",").alias("first3"),
        F.array_contains(tok, "the").alias("has_the"),
        F.element_at(tok, 1).alias("first_token"),
        F.element_at(tok, -1).alias("last_token"),
    )


@register("approx_distinct_stats", oracle=None, tags=("agg", "approx"))
def approx_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct + KLL approximate percentile over the
    fact table — the sketches a 100 TB profile pass actually uses
    (rows-only: sketch values are engine-specific by design; bounds are
    asserted in tests/test_advanced.py against exact counts)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx_median_price"),
    )


@register("ann_recall_report", oracle=None, tags=("vector", "ann", "quality"))
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the approximate search paths (SRP-LSH, sampled-
    centroid IVF, k-means-trained IVF, residual IVF-PQ with sampled
    and with trained coarse quantizers) against exact brute force, for
    20 queries — the quality/speed/memory dial report that justifies an
    ANN deployment (measured at sf0.01: 0.15 / 0.46 / 0.85 / 0.55 /
    0.74). Deterministic (seeded planes, id-stratified centroids,
    fixed Lloyd iteration count). Rows-only: one row per method.

    The sampled IVF rows probe the same fraction (n_probe/n_cells =
    1/4) so the comparison isolates quantizer quality: finer trained
    cells (128 cells × 32 probes, 3 Lloyd iterations) recover ≥0.7
    recall@10 at every test scale where the 16-cell sampled quantizer
    sits near 0.5 — the 100 TB lesson being that cell COUNT (finer
    partition of the space at a fixed probe fraction) beats extra
    training passes.

    ``ivf_pq_trained`` is the memory-lean trained configuration: the
    SAME trained 128-cell coarse quantizer as ``ivf_kmeans`` at the
    same quarter-probe fraction, plus 16-byte residual PQ codes
    (m=16 × 1 byte, a 16× index compression at dim=64 float32).
    Measured at sf0.01: recall@10 = 0.74 (n_probe sweep: 16→0.65,
    32→0.74, 48→0.77) vs 0.55 for the sampled-centroid IVF-PQ — the
    trained coarse quantizer's tighter cells shrink the residuals the
    PQ codes must cover, recovering most of the ivf_kmeans recall at a
    sixteenth of the memory.

    ``ivf_pq_deploy`` is the recommended deployment point on the dial:
    same trained quantizer, finer m=32 codes (32 bytes/vector — still
    8× compression) at n_probe=48. Measured at sf0.01 (median of 3):
    recall@10 = 0.865 vs 0.77 for 16-byte codes at the same n_probe,
    at statistically indistinguishable latency on this overhead-bound
    scale (4.4–5.9 s across all four m×n_probe configs) — the ADC scan
    cost grows with m, but candidate I/O dominates, so the finer codes
    are close to free until the probed-list scan itself is the
    bottleneck. Full dial measured this round: m16/np32 0.74, m16/np48
    0.77, m32/np32 0.81, m32/np48 0.865."""
    from rag_lakehouse_spark.operators.similarity import (
        kmeans_centroids,
        knn_exact,
        knn_ivf,
        knn_lsh,
    )

    from rag_lakehouse_spark.operators.pq import knn_ivf_pq

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    corpus = e.filter(F.col("vec_id") >= 20)
    # One join per method consumes `exact`; without a barrier the
    # brute-force scan re-runs per method (self-join recompute rule,
    # docs/SCALE.md). The checkpoint is queries×k id pairs — tiny.
    # `trained` needs none: kmeans_centroids returns driver-side
    # literals (training already ran eagerly inside the call).
    exact = (
        knn_exact(corpus, q, k=10)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    trained = kmeans_centroids(corpus, n_cells=128, n_iters=3)
    reports = []
    for method, approx in (
        ("srp_lsh", knn_lsh(corpus, q, k=10, dim=64, n_planes=4)),
        ("ivf", knn_ivf(corpus, q, k=10, n_cells=16, n_probe=4)),
        (
            "ivf_kmeans",
            knn_ivf(corpus, q, k=10, n_cells=128, n_probe=32, centroids_df=trained),
        ),
        (
            "ivf_pq",  # compressed-index point on the same dial:
            # quarter-probe over 16-byte residual codes (memory story)
            knn_ivf_pq(
                corpus, q, dim=64, k_neighbors=10,
                n_cells=64, n_probe=16, m=16, k_codes=256,
            ),
        ),
        (
            "ivf_pq_trained",  # memory-lean: trained coarse quantizer
            # (shared with ivf_kmeans) + 16-byte codes
            knn_ivf_pq(
                corpus, q, dim=64, k_neighbors=10,
                n_probe=32, m=16, k_codes=256, centroids_df=trained,
            ),
        ),
        (
            "ivf_pq_deploy",  # recommended: m=32 (32 B/vec, 8×
            # compression) at n_probe=48 — recall@10 0.865 at sf0.01
            knn_ivf_pq(
                corpus, q, dim=64, k_neighbors=10,
                n_probe=48, m=32, k_codes=256, centroids_df=trained,
            ),
        ),
    ):
        hits = exact.join(
            approx.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
        )
        reports.append(
            hits.agg(
                F.lit(method).alias("method"),
                (F.count(F.lit(1)).cast("double") / F.lit(200.0)).alias("recall_at_10"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionAll(r)
    return out


@register(
    "ann_ivf_incremental", oracle=None, tags=("vector", "ann", "ivf", "streaming")
)
def ann_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate k-NN served from a STREAMING-maintained IVF index:
    corpus embeddings replay through an availableNow file stream (4
    files, ≥4 micro-batches), each batch appending its nearest-centroid
    assignments — against a frozen deterministic quantizer — as an
    immutable O(batch) delta (streaming.append_state; never a rewrite
    of the corpus-sized index); queries then probe the maintained
    table via the
    same ``ivf_search`` the batch path uses. Per-vector assignment cost
    is paid once ever, the way a production vector index absorbs
    continuous ingest. Rows-only (ANN family has no SQL oracle);
    tests/test_streaming_vector.py asserts the result is IDENTICAL to
    the one-shot ``knn_ivf`` at the same quantizer — same expressions,
    same floats, same rows."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import Window as W

    from rag_lakehouse_spark.streaming.vector_sink import (
        knn_from_vector_index,
        maintain_vector_index,
    )

    n_cells = 16
    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") >= 20).select("vec_id", "embedding")
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    # The frozen quantizer: the same deterministic stratified sample
    # knn_ivf defaults to (first vector of every id%n_cells stratum).
    w_strat = W.partitionBy(F.col("vec_id") % n_cells).orderBy("vec_id")
    centroids = (
        corpus.withColumn("__rn", F.row_number().over(w_strat))
        .filter(F.col("__rn") == 1)
        .select(
            (F.col("vec_id") % n_cells).alias("cell_id"),
            F.col("embedding").alias("centroid"),
        )
    )
    base = tempfile.mkdtemp(prefix="rls_ivf_stream_")
    try:
        src = os.path.join(base, "embeddings")
        corpus.repartition(4).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(base, "ivf_index")
        maintain_vector_index(spark, stream, state, centroids).awaitTermination()
        return knn_from_vector_index(
            spark, state, q, centroids, k=10, n_probe=4
        ).localCheckpoint(eager=True)  # detach from the temp dir before rmtree
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register("knn_vectorized_topk", oracle=None, tags=("vector", "knn", "pandas"))
def knn_vectorized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized (NumPy BLAS) brute-force top-3 for 20 query vectors —
    the throughput path of knn_similarity_join. Rows-only here (BLAS
    sum order ≠ the oracle's strict left fold in the last float bits);
    tests assert id-level agreement with the exact expression path."""
    from rag_lakehouse_spark.operators.similarity import knn_exact_vectorized

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    return knn_exact_vectorized(e.filter(F.col("vec_id") >= 20), q, k=3)


# same DuckDB dot-product dialect as every other vector oracle
_RANKS_DOT = VEC.duckdb_dot("a.embedding", "b.embedding")


@register(
    "knn_vectorized_ranks",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    )
    SELECT query_id, neighbor_id, rank FROM (
      SELECT a.vec_id AS query_id,
             b.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                ORDER BY {_RANKS_DOT} / (a.nrm * b.nrm + 1e-24) DESC,
                                         b.vec_id) AS rank
      FROM e a, e b
      WHERE a.vec_id < 20 AND b.vec_id >= 20) t
    WHERE rank <= 3
    """,
    tags=("vector", "knn", "pandas"),
)
def knn_vectorized_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BLAS top-k ID SET, hash-oracled: same plan as
    ``knn_vectorized_topk`` but projecting (query_id, neighbor_id, rank)
    WITHOUT the float score, so the mapInPandas matrix-multiply path —
    previously rows-only because BLAS sum order differs from the
    oracle's strict left fold in the last bits — carries a full
    value-hash driver row. Safe by measurement at EVERY shipped scale:
    the minimum adjacent top-k score gap is 5.7e-5 at sf0.001, 2.2e-4
    at sf0.01, and 2.2e-4 at sf0.1 — each ≥7 orders of magnitude above
    float64 summation-order divergence, so ranks cannot flip between
    the BLAS and fold paths at any scale the driver samples. (The
    +1e-12 norm regularizer scales scores by <1e-12 relative, and the
    oracle's +1e-24 zero-norm guard — mirroring the implementation's
    regularizer so a zero-norm embedding cannot NULL the oracle score —
    by even less; both far below the gap.) The oracle ranks by the
    exact cosine with the same (score DESC, neighbor_id) tiebreak the
    window uses."""
    from rag_lakehouse_spark.operators.similarity import knn_exact_vectorized

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    return knn_exact_vectorized(e.filter(F.col("vec_id") >= 20), q, k=3).select(
        "query_id", "neighbor_id", "rank"
    )


@register(
    "salted_join_hot_events",
    oracle="""
    WITH dim(event_type, weight) AS (
      VALUES ('click', 1.0), ('view', 0.5), ('purchase', 5.0),
             ('signup', 3.0), ('error', 0.0)
    )
    SELECT e.event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(12,2)) * CAST(dim.weight AS DECIMAL(2,1)))
                AS DOUBLE) AS weighted_value
    FROM events e JOIN dim ON e.event_type = dim.event_type
    GROUP BY e.event_type
    """,
    tags=("join", "skew", "salted"),
)
def salted_join_hot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated equi-join on a HOT key: every event_type holds
    ~20% of the fact table, so an unsalted shuffle join lands each key
    on one reducer. ``salted_join`` spreads each hot key over 8
    reducers (left gets a random salt, right is replicated 8x and the
    shuffle key becomes (event_type, __salt)) — plan-asserted in
    tests/test_plans.py.

    The dim side carries a merge hint to emulate the
    too-big-to-broadcast case this pattern exists for (a 5-row literal
    dim would otherwise broadcast, hiding the salted exchange; when a
    dim DOES fit in memory, broadcast — not salting — is the answer).
    The oracle is the plain join: salting must not change semantics.
    """
    from rag_lakehouse_spark.operators.joins import salted_join

    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5), ("purchase", 5.0),
         ("signup", 3.0), ("error", 0.0)],
        "event_type string, weight double",
    ).hint("merge")
    joined = salted_join(e, dim, on="event_type", salt=8)
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.col("value").cast("decimal(12,2)") * F.col("weight").cast("decimal(2,1)")
        ).cast("double").alias("weighted_value"),
    )


@register("ann_pq_topk", oracle=None, tags=("vector", "ann", "pq", "pandas"))
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN end-to-end: train codebooks (bounded
    sample, driver-side Lloyd's), encode the corpus to m=8 one-byte
    codes (32x compression of a 64-dim float32 vector), ADC top-10 for
    20 queries. Rows-only (seeded k-means has no SQL oracle);
    tests/test_pq.py asserts recall against exact brute force and
    encoding determinism."""
    from rag_lakehouse_spark.operators.pq import pq_encode, pq_search, train_pq

    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") >= 20)
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    books = train_pq(corpus, dim=64, m=8, k=16)
    codes = pq_encode(corpus, books)
    return pq_search(codes, q, books, k_neighbors=10)


@register("ann_ivf_pq_topk", oracle=None, tags=("vector", "ann", "ivf", "pq", "pandas"))
def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composition (FAISS IVFADC shape): coarse cells restrict
    the search to n_probe/n_cells of the corpus, residual PQ codes
    approximate distances inside the probed lists. The memory story at
    100 TB: inverted lists of 16-byte codes instead of 256-byte raw
    vectors (16×), and only the probed quarter of the lists is read.
    Measured recall@10 at this setting: ~0.55 (vs 0.30 for full-scan
    m=8 raw PQ and 0.85 for trained IVF-flat over full vectors — the
    memory/recall dial between them). Rows-only (seeded k-means has no
    SQL oracle); tests/test_pq.py asserts a recall floor and
    shape/determinism contracts."""
    from rag_lakehouse_spark.operators.pq import knn_ivf_pq

    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") >= 20)
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    return knn_ivf_pq(
        corpus, q, dim=64, k_neighbors=10, n_cells=64, n_probe=16, m=16, k_codes=256
    )


@register(
    "graph_pagerank_influencers",
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ), edges AS (
      SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0
    ), deg AS (
      SELECT src, COUNT(*) AS d FROM edges GROUP BY src
    ), r0 AS (
      SELECT src AS node, CAST(1000000000000 AS BIGINT) AS rank FROM deg
    ), r1 AS (
      SELECT e.dst AS node,
             CAST((15 * 1000000000000 + 85 * SUM(r.rank // d.d)) // 100 AS BIGINT) AS rank
      FROM r0 r JOIN deg d ON d.src = r.node JOIN edges e ON e.src = r.node
      GROUP BY e.dst
    ), r2 AS (
      SELECT e.dst AS node,
             CAST((15 * 1000000000000 + 85 * SUM(r.rank // d.d)) // 100 AS BIGINT) AS rank
      FROM r1 r JOIN deg d ON d.src = r.node JOIN edges e ON e.src = r.node
      GROUP BY e.dst
    ), r3 AS (
      SELECT e.dst AS node,
             CAST((15 * 1000000000000 + 85 * SUM(r.rank // d.d)) // 100 AS BIGINT) AS rank
      FROM r2 r JOIN deg d ON d.src = r.node JOIN edges e ON e.src = r.node
      GROUP BY e.dst
    )
    SELECT node, rank FROM r3 ORDER BY rank DESC, node LIMIT 20
    """,
    tags=("graph", "iterative", "pagerank"),
)
def graph_pagerank_influencers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the bidirected customer↔supplier trade graph
    (nodes: custkey·2 / suppkey·2+1), top-20 after 3 power-iteration
    rounds — in exact scaled-INTEGER arithmetic (operators.graph), so
    the chained-CTE DuckDB oracle reproduces the fixpoint bit-for-bit
    (float PageRank would be order-dependent in its per-node sums and
    unverifiable across engines).

    Scale: each round is one join + one shuffle keyed by node id with
    checkpoint lineage truncation — the DataFrame power-iteration
    pattern, no graph library needed."""
    from rag_lakehouse_spark.operators.graph import integer_pagerank

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # bidirect in one pass over the join (explode both orientations)
    # instead of a self-union re-running the distinct per direction
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("c").alias("src"), F.col("s").alias("dst")),
                    F.struct(F.col("s").alias("src"), F.col("c").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
    )
    ranks = integer_pagerank(edges, iterations=3)
    return ranks.orderBy(F.desc("rank"), F.asc("node")).limit(20)


_RECURSIVE_BFS_SQL = """
WITH RECURSIVE e0 AS (
  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
), edges AS (
  SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0
), seeds AS (
  SELECT s_suppkey * 2 + 1 AS node
  FROM supplier JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_18'
), reach(node, hops) AS (
  SELECT node, 0 FROM seeds
  UNION ALL
  SELECT e.dst, r.hops + 1 FROM reach r JOIN edges e ON e.src = r.node
  WHERE r.hops < 2
)
SELECT node, CAST(MIN(hops) AS INTEGER) AS hops, COUNT(*) AS n_paths
FROM reach GROUP BY node
"""


def _reach_inputs(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Bidirected customer↔supplier edge set and the NATION_18 supplier
    seed nodes shared by the registered frontier query and the pytest
    recursive-SQL twin."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    # bidirect with ONE pass over the join (explode both orientations),
    # not a self-union that would recompute the orders⋈lineitem
    # distinct once per direction (docs/SCALE.md self-join rule)
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("c").alias("src"), F.col("s").alias("dst")),
                    F.struct(F.col("s").alias("src"), F.col("c").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
    )
    seeds = (
        s.join(F.broadcast(n.filter(F.col("n_name") == "NATION_18")),
               F.col("n_nationkey") == F.col("s_nationkey"))
        .select((F.col("s_suppkey") * 2 + 1).alias("node"))
    )
    return edges, seeds


@register(
    "recursive_cte_reach",
    oracle=_RECURSIVE_BFS_SQL,
    tags=("recursive-cte", "graph", "sql"),
)
def recursive_cte_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded BFS over the bidirected customer↔supplier graph from one
    nation's suppliers — per node the minimum hop count (≤2) and the
    number of distinct paths reaching it.

    Registered plan: aggregated-frontier path counting
    (operators.graph.bounded_path_counts) — per level one (node,
    n_paths) row per reachable node, so intermediates are bounded by
    |nodes| regardless of graph density. The recursive-CTE twin
    (_RECURSIVE_BFS_SQL, which Spark 4 can also execute directly)
    materializes one row per WALK — measured 1.04 M rows at sf0.1,
    already past Spark's 1 M recursion guardrail, and combinatorial in
    density from there — so it serves as the DuckDB oracle and a
    bounded-scale pytest check (tests/test_clusters.py), not as the
    registered plan. Same answer, by construction: the CTE's final
    GROUP BY node collapses exactly the per-walk rows the frontier
    never expands."""
    edges, seeds = _reach_inputs(spark, sf_dir)
    return bounded_path_counts(edges, seeds, max_hops=2)


@register(
    "orders_rfm_segments",
    oracle="""
    WITH anchor AS (
      SELECT MAX(o_orderdate) AS maxd FROM orders
    ), per_cust AS (
      SELECT o_custkey,
             CAST(date_diff('day', MAX(o_orderdate), anchor.maxd) AS BIGINT) AS r_days,
             CAST(COUNT(*) AS BIGINT) AS f_orders,
             CAST(floor(SUM(CAST(o_totalprice AS DECIMAL(12,2))) / 100) AS BIGINT)
               AS m_hundreds
      FROM orders, anchor GROUP BY o_custkey, anchor.maxd
    ), edges AS (
      SELECT quantile_cont(r_days, 0.333333) AS r1, quantile_cont(r_days, 0.666666) AS r2,
             quantile_cont(f_orders, 0.333333) AS f1, quantile_cont(f_orders, 0.666666) AS f2,
             quantile_cont(m_hundreds, 0.333333) AS m1, quantile_cont(m_hundreds, 0.666666) AS m2
      FROM per_cust
    )
    SELECT CAST(1 + (CASE WHEN r_days > r1 THEN 1 ELSE 0 END)
                  + (CASE WHEN r_days > r2 THEN 1 ELSE 0 END) AS BIGINT) AS r_score,
           CAST(1 + (CASE WHEN f_orders > f1 THEN 1 ELSE 0 END)
                  + (CASE WHEN f_orders > f2 THEN 1 ELSE 0 END) AS BIGINT) AS f_score,
           CAST(1 + (CASE WHEN m_hundreds > m1 THEN 1 ELSE 0 END)
                  + (CASE WHEN m_hundreds > m2 THEN 1 ELSE 0 END) AS BIGINT) AS m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM per_cust, edges
    GROUP BY 1, 2, 3
    """,
    tags=("agg", "segmentation", "analytics", "percentile"),
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — recency (days since last order,
    against the table's max date as the deterministic anchor),
    frequency (order count), monetary (lifetime spend) — each tertiled
    into scores 1-3 by broadcast percentile edges, reported as segment
    cell counts (the 27-cell cube a CRM mixture reads).

    Percentile inputs follow the r8 bounded-domain rule: recency days
    and order counts are naturally small-domain integers; spend is
    quantized to exact DECIMAL hundreds (floor(sum/100) — decimal
    floor, not a double cast) so the buffer is bounded by the spend
    range / 100, never by customer count. Score compares are
    integer-vs-double against bit-identical interpolated edges.

    Scale: one per-customer aggregate (map-side combined), a 1-row
    anchor and a 1-row edge table broadcast, one 27-cell final
    groupBy. No windows, no per-customer Python."""
    o = load_table(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("maxd"))
    per_cust = (
        o.crossJoin(F.broadcast(anchor))
        .groupBy("o_custkey", "maxd")
        .agg(
            F.datediff(
                F.col("maxd").cast("date"), F.max("o_orderdate").cast("date")
            ).cast("bigint").alias("r_days"),
            F.count(F.lit(1)).cast("bigint").alias("f_orders"),
            F.floor(
                F.sum(F.col("o_totalprice").cast("decimal(12,2)")) / 100
            ).cast("bigint").alias("m_hundreds"),
        )
    )
    def score(v, e1, e2):
        return (
            F.lit(1)
            + F.when(F.col(v) > F.col(e1), 1).otherwise(0)
            + F.when(F.col(v) > F.col(e2), 1).otherwise(0)
        ).cast("bigint")
    # per_cust feeds both the edge aggregate and the scoring join —
    # barrier per the multi-consumer rule (producer is a full-orders agg)
    per_cust = per_cust.localCheckpoint(eager=True)
    edges = per_cust.agg(
        F.percentile("r_days", 0.333333).alias("r1"),
        F.percentile("r_days", 0.666666).alias("r2"),
        F.percentile("f_orders", 0.333333).alias("f1"),
        F.percentile("f_orders", 0.666666).alias("f2"),
        F.percentile("m_hundreds", 0.333333).alias("m1"),
        F.percentile("m_hundreds", 0.666666).alias("m2"),
    )
    return (
        per_cust.crossJoin(F.broadcast(edges))
        .groupBy(
            score("r_days", "r1", "r2").alias("r_score"),
            score("f_orders", "f1", "f2").alias("f_score"),
            score("m_hundreds", "m1", "m2").alias("m_score"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
    )


@register(
    "orders_revenue_concentration",
    oracle="""
    WITH spend AS (
      SELECT c.c_mktsegment AS segment, o.o_custkey,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
               AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT segment, cents,
             ROW_NUMBER() OVER (PARTITION BY segment
                                ORDER BY cents DESC, o_custkey ASC) AS rk,
             COUNT(*) OVER (PARTITION BY segment) AS n
      FROM spend
    )
    SELECT segment,
           CAST(MAX(n) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(SUM(CASE WHEN rk * 5 <= n THEN cents ELSE 0 END) AS DOUBLE)
             / SUM(cents) AS top20_share,
           CAST(SUM(CASE WHEN rk * 100 <= n THEN cents ELSE 0 END) AS DOUBLE)
             / SUM(cents) AS top1_share
    FROM ranked GROUP BY segment
    """,
    tags=("agg", "concentration", "analytics", "distributed-scan"),
)
def orders_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration per market segment: the share of spend
    held by the top 20% and top 1% of customers (by rank — the
    whale-dependence number a revenue-risk review leads with). Spend
    is exact integer cents (decimal sum × 100, cast once), membership
    an integer rank compare, shares one final double division each.

    Scale: the per-segment rank runs on the TWO-PHASE DISTRIBUTED SCAN
    (``operators.distributed_scan.running_rank`` — the second
    production consumer after quality_gate_per_source): five segments
    would otherwise funnel customers/5 rows through one sort task. The
    oracle keeps the plain window form — identical ranks."""
    from rag_lakehouse_spark.operators.distributed_scan import running_rank

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    # spend feeds both the rank scan and the per-segment counts —
    # barrier per the multi-consumer rule (producer is the full
    # orders join + aggregate; the derived table is customer-sized)
    spend = (
        o.join(c, "o_custkey")
        .groupBy("segment", "o_custkey")
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(12,2)")) * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .localCheckpoint(eager=True)
    )
    # rank DESC by spend: order by (-cents, o_custkey) — running_rank
    # orders ascending, and the contract needs a unique order key
    ranked = running_rank(
        spend.withColumn("neg_cents", -F.col("cents")),
        part_cols=["segment"],
        order_cols=["neg_cents", "o_custkey"],
        out="rk",
    ).drop("neg_cents")
    counts = spend.groupBy("segment").agg(F.count(F.lit(1)).alias("n"))
    j = ranked.join(F.broadcast(counts), "segment")
    top20 = F.sum(F.when(F.col("rk") * 5 <= F.col("n"), F.col("cents")).otherwise(0))
    top1 = F.sum(F.when(F.col("rk") * 100 <= F.col("n"), F.col("cents")).otherwise(0))
    return j.groupBy("segment").agg(
        F.max("n").cast("bigint").alias("n_customers"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        (top20.cast("double") / F.sum("cents")).alias("top20_share"),
        (top1.cast("double") / F.sum("cents")).alias("top1_share"),
    )


# --- Portable HLL: the externally-oracled twin of the sketch family ---
# (approx_distinct_stats stays rows-only by design: HLL++/KLL register
# layouts are engine-specific). 256 registers (p=8): register index =
# low 8 bits of the portable 60-bit hash, rho = leading-zero rank of
# the remaining 52-bit window. Every arithmetic step is deterministic
# cross-engine: 2^-rho terms are summed as SCALED INTEGERS
# (1 << (53 - rho), max 256 * 2^53 < 2^62), the one int64 -> double
# cast is correctly rounded in both engines, alpha_m * m^2 is a shared
# Python literal (e-notation in the oracle per the r10 rule), and the
# linear-counting branch's ln rounds to 9 decimals (the BM25-idf
# precedent). Branch conditions compare bit-identical doubles, so both
# engines take the same branch.
_HLL_M = 256
_HLL_ALPHA_M2 = (0.7213 / (1.0 + 1.079 / _HLL_M)) * _HLL_M * _HLL_M
_POW53 = 1 << 53


def _hll_oracle() -> str:
    from rag_lakehouse_spark.operators.dedup_portable import duckdb_base60

    h60 = duckdb_base60("'hll:' || CAST(user_id AS VARCHAR)")
    return f"""
    WITH r AS (
      SELECT event_type, {h60} & 255 AS idx,
             CASE WHEN ({h60} >> 8) = 0 THEN 53
                  ELSE 53 - length(bin({h60} >> 8)) END AS rho
      FROM events WHERE user_id IS NOT NULL
    ), regs AS (
      SELECT event_type, idx, MAX(rho) AS reg_max
      FROM r GROUP BY event_type, idx
    ), s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_used,
             CAST(SUM(CAST(1 AS BIGINT) << (53 - reg_max)) AS BIGINT)
               AS s_present
      FROM regs GROUP BY event_type
    ), est AS (
      SELECT event_type, n_used,
             ({_HLL_ALPHA_M2:.17e})
               / (CAST(s_present + ({_HLL_M} - n_used) * {_POW53} AS DOUBLE)
                  / {float(_POW53):.17e}) AS e_raw
      FROM s
    ), ex AS (
      SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT)
               AS exact_distinct
      FROM events WHERE user_id IS NOT NULL GROUP BY event_type
    )
    SELECT e.event_type, CAST(e.n_used AS INT) AS n_registers_used,
           CASE WHEN e.e_raw <= {2.5 * _HLL_M!r}e0 AND e.n_used < {_HLL_M}
                THEN {float(_HLL_M)!r}e0
                     * round(ln({float(_HLL_M)!r}e0 / ({_HLL_M} - e.n_used)), 9)
                ELSE e.e_raw END AS est_distinct,
           x.exact_distinct,
           (CASE WHEN e.e_raw <= {2.5 * _HLL_M!r}e0 AND e.n_used < {_HLL_M}
                 THEN {float(_HLL_M)!r}e0
                      * round(ln({float(_HLL_M)!r}e0 / ({_HLL_M} - e.n_used)), 9)
                 ELSE e.e_raw END - x.exact_distinct)
             / x.exact_distinct AS rel_error
    FROM est e JOIN ex x USING (event_type)
    """


@register(
    "events_distinct_hll_portable",
    oracle=None,  # set below (builder needs module constants)
    tags=("agg", "approx", "sketch", "portable-twin"),
)
def events_distinct_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimation per event type with the
    ESTIMATE externally hash-checked — the portable-twin trick applied
    to the sketch family (``approx_distinct_stats`` stays rows-only:
    HLL++ register layouts are engine-specific; this twin freezes the
    hash to the portable 60-bit family and the layout to textbook
    Flajolet HLL, so DuckDB replays every register and correction
    bit-for-bit). Per type: register usage, the HLL estimate (raw
    harmonic-mean form, or linear counting below 2.5m — both branches
    deterministic, see the dialect comment above), the exact distinct
    count, and the relative error the sketch actually achieved — the
    accuracy report that justifies sketch-first dashboards.

    Scale: the shuffle carries (type, register, rho) — at most
    |types| x 256 groups after the map-side max — and registers are
    MERGEABLE (max), so the same fold serves streaming state or
    hypertable rollups; the exact side exists only for the error
    column and drops for true sketch-only serving. No large-range
    correction (estimates near 2^52 are out of scope and documented
    here)."""
    ev = load_table(spark, sf_dir, "events")
    regs = (
        hll_register_rows(ev)
        .groupBy("event_type", "idx")
        .agg(F.max("rho").alias("reg_max"))
    )
    return _hll_report(regs, ev)


def hll_register_rows(ev: DataFrame) -> DataFrame:
    """(event_type, idx, rho) — one portable-HLL register observation
    per non-NULL-user event. MERGEABLE under max(rho) per (type, idx),
    so the same rows feed the batch groupBy and the streaming-
    maintained register state (``streaming.rollup_sink.
    maintain_hll_registers``)."""
    from rag_lakehouse_spark.operators.dedup_portable import base60

    h60 = base60(F.concat(F.lit("hll:"), F.col("user_id").cast("string")))
    rem = F.shiftright(h60, 8)
    rho = F.when(rem == 0, F.lit(53)).otherwise(F.lit(53) - F.length(F.bin(rem)))
    return ev.filter(F.col("user_id").isNotNull()).select(
        "event_type",
        h60.bitwiseAND(F.lit(255)).alias("idx"),
        rho.alias("rho"),
    )


def hll_estimates(regs: DataFrame) -> DataFrame:
    """(event_type, n_registers_used, est_distinct) from maxed
    registers (event_type, idx, reg_max) — the deterministic estimate
    arithmetic shared by the batch twin and the streaming serving
    path (dialect rules in the comment above ``_hll_oracle``)."""
    s = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_used"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - reg_max AS INT))"))
        .cast("bigint")
        .alias("s_present"),
    )
    e_raw = F.lit(_HLL_ALPHA_M2) / (
        (
            F.col("s_present") + (F.lit(_HLL_M) - F.col("n_used")) * F.lit(_POW53)
        ).cast("double")
        / F.lit(float(_POW53))
    )
    lc = F.lit(float(_HLL_M)) * F.round(
        F.log(F.lit(float(_HLL_M)) / (F.lit(_HLL_M) - F.col("n_used"))), 9
    )
    est_col = F.when(
        (F.col("e_raw") <= F.lit(2.5 * _HLL_M)) & (F.col("n_used") < _HLL_M), lc
    ).otherwise(F.col("e_raw"))
    return s.select(
        "event_type",
        F.col("n_used").cast("int").alias("n_registers_used"),
        e_raw.alias("e_raw"),
        "n_used",
    ).select(
        "event_type", "n_registers_used", "n_used", est_col.alias("est_distinct")
    )


def _hll_report(regs: DataFrame, ev: DataFrame) -> DataFrame:
    """Estimates + the exact-side error columns (the exact scan exists
    only for the report; sketch-only serving drops it)."""
    est = hll_estimates(regs)
    ex = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").cast("bigint").alias("exact_distinct"))
    )
    return est.join(ex, "event_type").select(
        "event_type",
        "n_registers_used",
        "est_distinct",
        "exact_distinct",
        (
            (F.col("est_distinct") - F.col("exact_distinct"))
            / F.col("exact_distinct")
        ).alias("rel_error"),
    )


@register(
    "events_hll_incremental",
    oracle=None,  # set below — shares the batch twin's oracle
    tags=("agg", "approx", "sketch", "streaming", "portable-twin"),
)
def events_hll_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user estimates served from STREAMING-MAINTAINED HLL
    registers: events replay through an availableNow file stream (4
    files, ≥4 micro-batches), each batch folding its (type, register,
    rho) maxima into versioned state via the rollup sink's fold
    machinery — registers are mergeable maxima, so arrival order and
    batch boundaries cannot change them, and the served estimates are
    bit-identical to the one-shot ``events_distinct_hll_portable``
    (SHARED oracle — the hash check proves the maintained registers
    equal the batch registers). The sixth incremental-index family
    member (exact dedup, MinHash postings, IVF, BM25 postings, media
    metadata, HLL registers).

    Scale: per-increment cost is one micro-batch hash + a
    |types| x 256-row state merge; history is never re-hashed. The
    exact-distinct column joins from the batch table for the error
    report only — sketch-only serving reads state alone.

    r12: after the stream terminates the state is COMPACTED
    (``compact_fold_state`` — rewrite as canonical v0, drop
    predecessors) and the report is served from the post-compaction
    read, so the shared oracle also externally hash-checks that
    offline compaction preserves every register (the
    across-the-boundary fold semantics are pytest-pinned in
    tests/test_streaming_rollup.py for all eight fold families)."""
    import os
    import shutil
    import tempfile

    from rag_lakehouse_spark.streaming.rollup_sink import (
        compact_fold_state,
        maintain_hll_registers,
        read_hll_registers,
    )

    base = tempfile.mkdtemp(prefix="rls_hll_stream_")
    try:
        src = os.path.join(base, "events")
        ev = load_table(spark, sf_dir, "events")
        ev.select("event_type", "user_id").repartition(4).write.mode(
            "overwrite"
        ).parquet(src)
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(base, "hll_registers")
        maintain_hll_registers(spark, stream, state).awaitTermination()
        assert compact_fold_state(spark, state)  # offline maintenance
        regs = read_hll_registers(spark, state).localCheckpoint(eager=True)
        return _hll_report(regs, ev).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


from rag_lakehouse_spark.plans import registry as _registry  # noqa: E402

_registry.QUERIES["events_distinct_hll_portable"].oracle = _hll_oracle()
_registry.QUERIES["events_hll_incremental"].oracle = _hll_oracle()


# --- Portable Bloom-filter prefilter: the runtime-filter join pattern ---


_BLOOM_RICH_SQL = "SELECT c_custkey FROM customer WHERE c_acctbal > 9000"


def _bloom_oracle(keys_sql: str = _BLOOM_RICH_SQL) -> str:
    from rag_lakehouse_spark.operators.bloom import (
        duckdb_bloom_cte,
        duckdb_bloom_probe,
    )

    cte = duckdb_bloom_cte(keys_sql, "c_custkey")
    return f"""
    WITH {cte},
    probe AS (
      SELECT o.o_custkey AS key,
             (k.key IS NOT NULL) AS is_member,
             {duckdb_bloom_probe("o.o_custkey")} AS bloom_pass
      FROM orders o CROSS JOIN bloom LEFT JOIN k ON k.key = o.o_custkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_probe,
           CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
             AS n_members,
           CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bloom_pass,
           CAST(SUM(CASE WHEN bloom_pass AND NOT is_member THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_pos,
           CAST(SUM(CASE WHEN is_member AND NOT bloom_pass THEN 1 ELSE 0 END)
                AS BIGINT) AS n_missed_members,
           (SELECT CAST(list_sum(list_transform(words, w -> bit_count(w)))
                        AS BIGINT) FROM bloom) AS bits_set,
           CAST(SUM(CASE WHEN bloom_pass AND NOT is_member THEN 1 ELSE 0 END)
                AS DOUBLE)
             / nullif(COUNT(*) - SUM(CASE WHEN is_member THEN 1 ELSE 0 END), 0)
             AS fp_rate
    FROM probe
    """


@register(
    "join_bloom_prefilter",
    oracle=None,  # set below (builder imports the bloom module)
    tags=("join", "sketch", "portable-twin", "runtime-filter"),
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The runtime-filter join made an explicit, auditable operator:
    a portable Bloom filter (4096 bits, k=4, positions from the top 12
    bits of four affine transforms of the 60-bit hash) is BUILT
    distributed over the selective side (rich customers,
    c_acctbal > 9000), collected as the 128-word bitmap (512 B —
    bounded by the parameter, not the data), and PROBED map-only over
    the big side (every order's custkey) as a literal-array
    expression. The report hash-checks the sketch's exact accounting:
    probe volume, true member rows, bloom passes, false positives,
    the structural zero of ``n_missed_members`` (a Bloom filter has
    no false negatives — surfaced as data, not prose), the bitmap's
    set-bit count, and the achieved false-positive rate.

    Scale: build shuffles at most 128 partial-OR words per task
    (mergeable bit_or); the probe side never shuffles — at 100 TB the
    bitmap rides the closure to every executor and the exact join
    runs only on survivors. DuckDB rebuilds the identical bitmap and
    replays every probe, so a single wrong bit anywhere breaks the
    hash."""
    from rag_lakehouse_spark.operators.bloom import bloom_build

    cust = load_table(spark, sf_dir, "customer")
    keys = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    words = bloom_build(keys, "c_custkey")
    return _bloom_report(spark, sf_dir, words)


def _bloom_report(
    spark: SparkSession,
    sf_dir: str,
    words: list[int],
    keys: DataFrame | None = None,
) -> DataFrame:
    """The probe-side accounting shared by the batch build, the
    streaming-maintained twin, and the OR-union build: given the
    128-word bitmap (and optionally a non-default exact member-key
    relation), probe every order map-only and compare against the
    exact member set."""
    from rag_lakehouse_spark.operators.bloom import bloom_probe

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    if keys is None:
        keys = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    bits_set = sum(bin(w).count("1") for w in words)
    member = keys.withColumn("is_m", F.lit(True))
    probed = (
        orders.select(F.col("o_custkey").alias("key"))
        .join(F.broadcast(member), F.col("key") == F.col("c_custkey"), "left")
        .select(
            "key",
            F.coalesce("is_m", F.lit(False)).alias("is_member"),
            bloom_probe(words, F.col("key")).alias("bloom_pass"),
        )
    )
    agg = probed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probe"),
        F.sum(F.when(F.col("is_member"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_members"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_bloom_pass"),
        F.sum(F.when(F.col("bloom_pass") & ~F.col("is_member"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_false_pos"),
        F.sum(F.when(F.col("is_member") & ~F.col("bloom_pass"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_missed_members"),
    )
    denom = F.col("n_probe") - F.col("n_members")
    return agg.select(
        "n_probe",
        "n_members",
        "n_bloom_pass",
        "n_false_pos",
        "n_missed_members",
        F.lit(bits_set).cast("bigint").alias("bits_set"),
        F.when(denom > 0, F.col("n_false_pos").cast("double") / denom).alias(
            "fp_rate"
        ),
    )


@register(
    "join_bloom_incremental",
    oracle=None,  # set below — shares the batch twin's oracle
    tags=("join", "sketch", "streaming", "portable-twin", "runtime-filter"),
)
def join_bloom_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The runtime-filter bitmap MAINTAINED BY A STREAM: rich-customer
    keys replay through an availableNow file stream (4 files, >=4
    micro-batches), each batch's bit positions OR-folded into
    versioned state via the rollup sink's fold machinery — bitwise OR
    is idempotent AND mergeable, so the maintained bitmap provably
    equals the batch-built one whatever the batching (SHARED oracle:
    the probe-side hash check proves it externally). The EIGHTH
    incremental-index family member, and the operational shape of
    runtime filters under continuous ingest: the probe side always
    reads a current 512 B bitmap, never re-hashes key history.

    Scale: per-increment cost is one micro-batch hash + a <=128-row
    OR-merge; serving reads 128 rows. The probe/report side is
    identical to ``join_bloom_prefilter``."""
    import os
    import shutil
    import tempfile

    from rag_lakehouse_spark.operators.bloom import N_WORDS
    from rag_lakehouse_spark.streaming.rollup_sink import (
        maintain_bloom_words,
        read_bloom_words,
    )

    base = tempfile.mkdtemp(prefix="rls_bloom_stream_")
    try:
        src = os.path.join(base, "keys")
        cust = load_table(spark, sf_dir, "customer")
        cust.filter(F.col("c_acctbal") > 9000).select("c_custkey").repartition(
            4
        ).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(base, "bloom_words")
        maintain_bloom_words(spark, stream, state).awaitTermination()
        dense = [0] * N_WORDS
        for r in read_bloom_words(spark, state).collect():
            dense[r["word"]] = r["w"]
        return _bloom_report(spark, sf_dir, dense).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


_registry.QUERIES["join_bloom_prefilter"].oracle = _bloom_oracle()
_registry.QUERIES["join_bloom_incremental"].oracle = _bloom_oracle()


# --- Portable log-bucket quantile sketch: the quantile member of the
# sketch family (HLL = distinct, CMS = frequency, Bloom = membership,
# MG = heavy hitters, this = quantiles) ---


_QSK_RANKS = (("p50", 50), ("p90", 90), ("p99", 99))


def _qsk_centi_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared non-negative centi-grid projection of event values, used
    by both the build (``events_quantile_sketch_portable``) and merge
    (``events_quantile_sketch_merged``) halves of the DDSketch-style
    story. Negative values are out of the log-bucket domain and
    excluded (the generated events are non-negative; a production
    deployment runs one sketch per sign)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        F.col("value").isNotNull() & (F.col("value") >= 0.0)
    ).select(
        "event_type",
        F.floor(F.col("value") * F.lit(100.0)).cast("bigint").alias("q"),
    )


def _qsk_ekey():
    """Log-bucket key of the centi value ``q``: (bit length)*64 +
    top-5-bit mantissa — pure integer arithmetic via the
    ``length(bin())`` trick; bounded relative error 2^-4 and at most
    64*16 buckets whatever the data."""
    e = F.length(F.bin("q"))
    return e.cast("bigint") * 64 + F.expr(
        "shiftright(q, greatest(CAST(length(bin(q)) AS INT) - 5, 0))"
    )


def _qsk_rank_picks(
    counts: DataFrame,
    group_cols: list[str],
    val_col: str,
    prefix: str,
    with_n: bool = False,
) -> DataFrame:
    """The shared cumulative rank walk, parameterized by grouping
    columns (r12 accepted-debt item: one walk definition for the build
    and merge halves). ``counts`` holds one row per (group, val) with a
    bigint count ``c``; the walk picks, per group (global when
    ``group_cols`` is empty), the smallest ``val_col`` whose cumulative
    count reaches rank ceil(pct * n / 100) for each ``_QSK_RANKS``
    entry — exact integer arithmetic, aliased ``{prefix}_{name}``.
    Windows only over BOUNDED aggregate rows (≤1k log buckets or the
    centi-grid), never raw events — the standing bounded-domain rule."""
    wwalk = (
        W.partitionBy(*group_cols)
        .orderBy(val_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cw = counts.select(
        *group_cols,
        val_col,
        F.sum("c").over(wwalk).alias("cum"),
        F.sum("c").over(W.partitionBy(*group_cols)).alias("n"),
    )
    aggs = ([F.max("n").cast("bigint").alias("n")] if with_n else []) + [
        F.min(
            F.when(
                F.col("cum") >= F.expr(f"(n * {pct} + 99) DIV 100"),
                F.col(val_col),
            )
        ).alias(f"{prefix}_{nm}")
        for nm, pct in _QSK_RANKS
    ]
    return cw.groupBy(*group_cols).agg(*aggs)


def _qsk_error_cols() -> list:
    """Estimate / exact / achieved-relative-error output columns from
    the ``k_*`` (bucket-key pick) and ``x_*`` (exact centi pick)
    columns; estimates are bucket LOWER bounds so ``rel_err`` is
    structurally in (-2^-4, 0] past the exact-mantissa range."""
    cols = []
    for nm, _pct in _QSK_RANKS:
        lb = F.expr(
            f"CAST(shiftleft(k_{nm} % 64,"
            f" greatest(CAST(k_{nm} DIV 64 AS INT) - 5, 0)) AS DOUBLE)"
        )
        exv = F.col(f"x_{nm}").cast("double")
        cols += [
            (lb / F.lit(100.0)).alias(f"{nm}_est"),
            (exv / F.lit(100.0)).alias(f"{nm}_exact"),
            ((lb - exv) / exv).alias(f"{nm}_rel_err"),
        ]
    return cols


def _qsketch_oracle() -> str:
    picks_est = ", ".join(
        f"MIN(CASE WHEN cum >= (n * {pct} + 99) // 100 THEN ekey END)"
        f" AS k_{nm}"
        for nm, pct in _QSK_RANKS
    )
    picks_ex = ", ".join(
        f"MIN(CASE WHEN cumq >= (nq * {pct} + 99) // 100 THEN q END)"
        f" AS x_{nm}"
        for nm, pct in _QSK_RANKS
    )
    outs = ", ".join(
        f"CAST((k_{nm} % 64) << greatest(CAST(k_{nm} // 64 AS INT) - 5, 0)"
        f"     AS DOUBLE) / 1e2 AS {nm}_est,\n"
        f"           CAST(x_{nm} AS DOUBLE) / 1e2 AS {nm}_exact,\n"
        f"           (CAST((k_{nm} % 64) << greatest(CAST(k_{nm} // 64 AS INT)"
        f" - 5, 0) AS DOUBLE) - CAST(x_{nm} AS DOUBLE)) / CAST(x_{nm} AS DOUBLE)"
        f" AS {nm}_rel_err"
        for nm, pct in _QSK_RANKS
    )
    return f"""
    WITH base AS (
      SELECT event_type, CAST(floor(value * 1e2) AS BIGINT) AS q
      FROM events WHERE value IS NOT NULL AND value >= 0e0
    ), hb AS (
      SELECT event_type,
             length(bin(q)) * 64
               + (q >> greatest(length(bin(q)) - 5, 0)) AS ekey,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM base GROUP BY 1, 2
    ), hw AS (
      SELECT event_type, ekey, c,
             SUM(c) OVER (PARTITION BY event_type ORDER BY ekey
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(c) OVER (PARTITION BY event_type) AS n
      FROM hb
    ), est AS (
      SELECT event_type, CAST(MAX(n) AS BIGINT) AS n, {picks_est}
      FROM hw GROUP BY event_type
    ), qb AS (
      SELECT event_type, q, CAST(COUNT(*) AS BIGINT) AS c
      FROM base GROUP BY 1, 2
    ), qw AS (
      SELECT event_type, q, c,
             SUM(c) OVER (PARTITION BY event_type ORDER BY q
                          ROWS UNBOUNDED PRECEDING) AS cumq,
             SUM(c) OVER (PARTITION BY event_type) AS nq
      FROM qb
    ), ex AS (
      SELECT event_type, {picks_ex} FROM qw GROUP BY event_type
    )
    SELECT est.event_type, est.n, {outs}
    FROM est JOIN ex USING (event_type)
    """


@register(
    "events_quantile_sketch_portable",
    oracle=None,  # set below (builder uses the shared rank table)
    tags=("agg", "approx", "sketch", "portable-twin"),
)
def events_quantile_sketch_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDSketch-style quantile estimation with the ESTIMATES externally
    hash-checked: values quantize to the centi-unit integer grid, land
    in LOG buckets keyed by (bit length, top-5-bits mantissa) — pure
    integer arithmetic via the ``length(bin())`` trick, bounded
    relative error 2^-4 by construction, and at most 64*16 buckets per
    group whatever the data — then p50/p90/p99 read off the cumulative
    bucket walk (rank = ceil(p*n) in exact integers). The exact side
    replays the same walk on the raw centi-grid for the achieved-error
    columns — the accuracy report that justifies sketch-first latency
    dashboards. Estimates are bucket LOWER bounds, so ``rel_err`` is
    structurally in (-2^-4, 0] for buckets past the exact-mantissa
    range — surfaced as data.

    Scale: bucket counts are mergeable SUMS (the same fold serves
    streaming maintenance or hypertable rollups); the shuffle carries
    (type, bucket) partials — ≤ ~1k groups per type — and the rank
    walk windows over BOUNDED aggregates, never over raw events (the
    standing bounded-domain rule; contrast a naive percentile's
    per-type global sort). The exact side exists only for the error
    columns and drops for sketch-only serving. Negative values are
    out of the log-bucket domain and excluded by the filter (the
    generated events are non-negative; a production deployment runs
    one sketch per sign)."""
    base = _qsk_centi_base(spark, sf_dir)
    hb = (
        base.select("event_type", _qsk_ekey().alias("ekey"))
        .groupBy("event_type", "ekey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    est = _qsk_rank_picks(hb, ["event_type"], "ekey", "k", with_n=True)
    qb = base.groupBy("event_type", "q").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    ex = _qsk_rank_picks(qb, ["event_type"], "q", "x")
    j = est.join(ex, "event_type")
    return j.select("event_type", "n", *_qsk_error_cols())


_registry.QUERIES["events_quantile_sketch_portable"].oracle = _qsketch_oracle()


# --- Portable HLL set algebra: union / intersection from registers ---


def _hll_union_oracle() -> str:
    from rag_lakehouse_spark.operators.dedup_portable import duckdb_base60

    h60 = duckdb_base60("'hll:' || CAST(user_id AS VARCHAR)")
    est = (
        f"CASE WHEN e_raw <= {2.5 * _HLL_M!r}e0 AND n_used < {_HLL_M} "
        f"THEN {float(_HLL_M)!r}e0 "
        f"* round(ln({float(_HLL_M)!r}e0 / ({_HLL_M} - n_used)), 9) "
        f"ELSE e_raw END"
    )
    return f"""
    WITH base AS (
      SELECT event_type, user_id FROM events
      WHERE user_id IS NOT NULL AND event_type IN ('click', 'purchase')
        AND value >= 195
    ), r AS (
      SELECT event_type AS s, {h60} & 255 AS idx,
             CASE WHEN ({h60} >> 8) = 0 THEN 53
                  ELSE 53 - length(bin({h60} >> 8)) END AS rho
      FROM base
    ), regs AS (
      SELECT s, idx, MAX(rho) AS reg_max FROM r GROUP BY s, idx
    ), allregs AS (
      SELECT s, idx, reg_max FROM regs
      UNION ALL
      SELECT 'union' AS s, idx, MAX(reg_max) AS reg_max
      FROM regs GROUP BY idx
    ), st AS (
      SELECT s, CAST(COUNT(*) AS BIGINT) AS n_used,
             CAST(SUM(CAST(1 AS BIGINT) << (53 - reg_max)) AS BIGINT)
               AS s_present
      FROM allregs GROUP BY s
    ), est AS (
      SELECT s, n_used,
             ({_HLL_ALPHA_M2:.17e})
               / (CAST(s_present + ({_HLL_M} - n_used) * {_POW53} AS DOUBLE)
                  / {float(_POW53):.17e}) AS e_raw
      FROM st
    ), fin AS (
      SELECT s, {est} AS est_d FROM est
    ), ex AS (
      SELECT CAST(COUNT(DISTINCT CASE WHEN event_type = 'click'
                                      THEN user_id END) AS BIGINT)
               AS exact_a,
             CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                      THEN user_id END) AS BIGINT)
               AS exact_b,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_union
      FROM base
    )
    SELECT a.est_d AS est_a, b.est_d AS est_b, u.est_d AS est_union,
           (a.est_d + b.est_d) - u.est_d AS est_intersection,
           x.exact_a, x.exact_b, x.exact_union,
           (x.exact_a + x.exact_b) - x.exact_union AS exact_intersection,
           (u.est_d - x.exact_union) / x.exact_union AS rel_error_union
    FROM (SELECT est_d FROM fin WHERE s = 'click') a,
         (SELECT est_d FROM fin WHERE s = 'purchase') b,
         (SELECT est_d FROM fin WHERE s = 'union') u, ex x
    """


@register(
    "events_hll_union_portable",
    oracle=None,  # set below (builder needs module constants)
    tags=("agg", "approx", "sketch", "portable-twin", "set-algebra"),
)
def events_hll_union_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL SET ALGEBRA with the estimates externally hash-checked: the
    property that makes sketches the 100 TB distinct-count tool is
    that registers are MERGEABLE — the union of two user sets is
    estimated by the element-wise MAX of their register vectors
    without touching raw data, and intersections follow by
    inclusion-exclusion (est_a + est_b - est_union; no register
    operation exists for intersection — the standard sketch-algebra
    identity, with its known error amplification on small overlaps).
    Per the portable-twin discipline both engines replay registers,
    union fold, both estimate branches, and the inclusion-exclusion
    arithmetic bit-for-bit; exact distinct counts ride along so the
    row also REPORTS the achieved union error.

    Scale: the union estimate costs one 256-row max-fold over
    per-set register tables that a streaming pipeline already
    maintains (``events_hll_incremental``) — audience-overlap answers
    at any segment granularity with ZERO additional scans of the
    event log. The per-set register aggregate (≤ 2x256 rows) is
    eagerly checkpointed before it feeds both the per-set and the
    union estimates, so the event scan happens exactly once (the KN
    type-table rule: checkpoint the BOUNDED aggregate, never re-plan
    the corpus).

    Reference parity: beyond the reference (no sketch surface);
    sketch-first serving for the analytics dashboards its API
    (src/api.py:10-84) would front at scale."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(
        F.col("user_id").isNotNull()
        & F.col("event_type").isin("click", "purchase")
        & (F.col("value") >= 195)
    )
    regs = (
        hll_register_rows(base)
        .groupBy("event_type", "idx")
        .agg(F.max("rho").alias("reg_max"))
        .localCheckpoint(eager=True)
    )
    union_regs = (
        regs.groupBy("idx")
        .agg(F.max("reg_max").alias("reg_max"))
        .select(F.lit("union").alias("event_type"), "idx", "reg_max")
    )
    est = hll_estimates(regs.unionByName(union_regs))
    pick = lambda s: F.max(  # noqa: E731 — 3-row pivot
        F.when(F.col("event_type") == s, F.col("est_distinct"))
    )
    piv = est.groupBy().agg(
        pick("click").alias("est_a"),
        pick("purchase").alias("est_b"),
        pick("union").alias("est_union"),
    )
    ex = base.groupBy().agg(
        F.count_distinct(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        )
        .cast("bigint")
        .alias("exact_a"),
        F.count_distinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        )
        .cast("bigint")
        .alias("exact_b"),
        F.count_distinct("user_id").cast("bigint").alias("exact_union"),
    )
    return piv.crossJoin(F.broadcast(ex)).select(
        "est_a",
        "est_b",
        "est_union",
        ((F.col("est_a") + F.col("est_b")) - F.col("est_union")).alias(
            "est_intersection"
        ),
        "exact_a",
        "exact_b",
        "exact_union",
        ((F.col("exact_a") + F.col("exact_b")) - F.col("exact_union")).alias(
            "exact_intersection"
        ),
        (
            (F.col("est_union") - F.col("exact_union"))
            / F.col("exact_union")
        ).alias("rel_error_union"),
    )


_registry.QUERIES["events_hll_union_portable"].oracle = _hll_union_oracle()


def _qsketch_merged_oracle() -> str:
    picks_est = ", ".join(
        f"MIN(CASE WHEN cum >= (n * {pct} + 99) // 100 THEN ekey END)"
        f" AS k_{nm}"
        for nm, pct in _QSK_RANKS
    )
    picks_ex = ", ".join(
        f"MIN(CASE WHEN cumq >= (nq * {pct} + 99) // 100 THEN q END)"
        f" AS x_{nm}"
        for nm, pct in _QSK_RANKS
    )
    outs = ", ".join(
        f"CAST((k_{nm} % 64) << greatest(CAST(k_{nm} // 64 AS INT) - 5, 0)"
        f"     AS DOUBLE) / 1e2 AS {nm}_est,\n"
        f"           CAST(x_{nm} AS DOUBLE) / 1e2 AS {nm}_exact,\n"
        f"           (CAST((k_{nm} % 64) << greatest(CAST(k_{nm} // 64 AS INT)"
        f" - 5, 0) AS DOUBLE) - CAST(x_{nm} AS DOUBLE)) / CAST(x_{nm} AS DOUBLE)"
        f" AS {nm}_rel_err"
        for nm, pct in _QSK_RANKS
    )
    return f"""
    WITH base AS (
      SELECT event_type, CAST(floor(value * 1e2) AS BIGINT) AS q
      FROM events WHERE value IS NOT NULL AND value >= 0e0
    ), hb AS (
      SELECT event_type,
             length(bin(q)) * 64
               + (q >> greatest(length(bin(q)) - 5, 0)) AS ekey,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM base GROUP BY 1, 2
    ), merged AS (
      SELECT ekey, CAST(SUM(c) AS BIGINT) AS c FROM hb GROUP BY ekey
    ), hw AS (
      SELECT ekey, c,
             SUM(c) OVER (ORDER BY ekey ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(c) OVER () AS n
      FROM merged
    ), est AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n, {picks_est} FROM hw
    ), qb AS (
      SELECT q, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY q
    ), qw AS (
      SELECT q, c,
             SUM(c) OVER (ORDER BY q ROWS UNBOUNDED PRECEDING) AS cumq,
             SUM(c) OVER () AS nq
      FROM qb
    ), ex AS (
      SELECT {picks_ex} FROM qw
    ), tm AS (
      SELECT CAST(COUNT(DISTINCT event_type) AS INT) AS n_types_merged
      FROM base
    )
    SELECT tm.n_types_merged, est.n, {outs}
    FROM est, ex, tm
    """


@register(
    "events_quantile_sketch_merged",
    oracle=None,  # set below (shares the rank machinery)
    tags=("agg", "approx", "sketch", "portable-twin", "set-algebra"),
)
def events_quantile_sketch_merged(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quantile-sketch MERGE with the merged estimates externally
    hash-checked — the mergeability half of the DDSketch-style story
    (``events_quantile_sketch_portable`` is the build half): per-type
    log-bucket tables (the per-segment sketch artifacts a pipeline
    maintains) are merged into one global sketch by SUMMING bucket
    counts — never re-touching raw rows — and the global p50/p90/p99
    read off the merged walk. The oracle computes the global quantiles
    DIRECTLY from raw values, so the hash check proves the sketch-
    algebra identity: merge-of-partials == build-over-union, the
    property that lets 1000 executors sketch independently and a
    coordinator fold 64x16-bucket tables instead of re-scanning
    100 TB. Exact global quantiles ride along for the achieved-error
    columns.

    Scale: the merge input is |types| x ≤1k bucket rows; the merged
    walk windows over ≤1k rows with no partition — bounded whatever
    the data. The raw-value exact side exists only for the error
    report and drops for sketch-only serving."""
    base = _qsk_centi_base(spark, sf_dir)
    hb = (
        base.select("event_type", _qsk_ekey().alias("ekey"))
        .groupBy("event_type", "ekey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=True)  # the bounded per-segment sketches
    )
    merged = hb.groupBy("ekey").agg(F.sum("c").cast("bigint").alias("c"))
    est = _qsk_rank_picks(merged, [], "ekey", "k", with_n=True)
    qb = base.groupBy("q").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    ex = _qsk_rank_picks(qb, [], "q", "x")
    tm = hb.groupBy().agg(
        F.count_distinct("event_type").cast("int").alias("n_types_merged")
    )
    j = est.crossJoin(F.broadcast(ex)).crossJoin(F.broadcast(tm))
    return j.select("n_types_merged", "n", *_qsk_error_cols())


_registry.QUERIES["events_quantile_sketch_merged"].oracle = (
    _qsketch_merged_oracle()
)


_BLOOM_BUILDING_SQL = (
    "SELECT c_custkey FROM customer"
    " WHERE c_mktsegment = 'BUILDING' AND c_acctbal < 1000"
)


@register(
    "join_bloom_union",
    oracle=None,  # set below (builder composes the union keys SQL)
    tags=("join", "sketch", "portable-twin", "runtime-filter", "set-algebra"),
)
def join_bloom_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter SET ALGEBRA with the merged bitmap externally
    hash-checked — the membership member of the sketch-algebra trio
    (HLL union by register MAX, quantile merge by bucket SUM, Bloom
    union by word OR): two filters built INDEPENDENTLY over different
    member predicates (rich customers; low-balance BUILDING-segment
    customers) are merged word-wise with bitwise OR, and the merged
    bitmap probes every order with exact accounting against the exact
    union member set. The oracle builds ONE filter directly over the
    SQL UNION of the two key sets, so the hash check proves
    merge-of-partials == build-over-union for the OR fold — the
    identity that lets each ingest segment maintain its own bitmap
    while the probe side reads a single OR of all of them.
    ``n_missed_members`` stays structurally 0 across the merge
    (OR only sets bits).

    Scale: each build shuffles ≤128 partial-OR words; the merge is a
    128-word driver fold; the probe side never shuffles. Same 512 B
    broadcast contract as ``join_bloom_prefilter``."""
    from rag_lakehouse_spark.operators.bloom import N_WORDS, bloom_build

    cust = load_table(spark, sf_dir, "customer")
    rich = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    building = cust.filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") < 1000)
    ).select("c_custkey")
    wa = bloom_build(rich, "c_custkey")
    wb = bloom_build(building, "c_custkey")
    words = [wa[i] | wb[i] for i in range(N_WORDS)]
    union_keys = rich.unionByName(building).distinct()
    return _bloom_report(spark, sf_dir, words, keys=union_keys)


_registry.QUERIES["join_bloom_union"].oracle = _bloom_oracle(
    f"{_BLOOM_RICH_SQL} UNION {_BLOOM_BUILDING_SQL}"
)
