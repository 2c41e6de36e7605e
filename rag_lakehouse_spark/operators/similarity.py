"""Similarity-search operators: exact brute-force k-NN (baseline) and
the scale paths — LSH-bucketed and IVF (coarse-quantizer) approximate
search over ``array<float>`` embedding columns.

Replaces the reference's Chroma ``collection.query(query_embeddings,
n_results=k)`` (reference src/api.py:38-42) with DataFrame plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from rag_lakehouse_spark.functions.vector import cosine, dot, l2_distance, l2_norm


def knn_exact(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "q_emb",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k similarity join: every query row against the full
    corpus, ranked per query.

    Scale: queries broadcast (they're the small side by construction);
    scoring is codegen'd expression work streamed over corpus
    partitions; the per-query rank window shuffles only on query_id and
    WindowGroupLimit keeps k rows per partition pre-shuffle. Crossover:
    when |queries|×|corpus| work exceeds budget, switch to
    ``knn_lsh``/``knn_ivf``.

    Cosine norms are HOISTED: each side projects its ``l2_norm`` once
    per row below the join, so the per-pair work is exactly one dot
    fold — the naive ``cosine()`` per pair recomputes both norms for
    every corpus×query pair (3 folds/pair, ~3× the array work on the
    quadratic stage).
    """
    if metric == "cosine":
        c = corpus.withColumn("__nrm_c", l2_norm(F.col(corpus_vec)))
        q = queries.withColumn("__nrm_q", l2_norm(F.col(query_vec)))
        score = dot(F.col(corpus_vec), F.col(query_vec)) / (
            F.col("__nrm_c") * F.col("__nrm_q")
        )
    else:
        c, q = corpus, queries
        score = -l2_distance(F.col(corpus_vec), F.col(query_vec))
    scored = c.crossJoin(F.broadcast(q)).select(
        F.col(query_id),
        F.col(corpus_id).alias("neighbor_id"),
        score.alias("score"),
    )
    w = W.partitionBy(query_id).orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def knn_exact_vectorized(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "q_emb",
) -> DataFrame:
    """Exact cosine top-k via NumPy BLAS inside mapInPandas — the
    throughput path for brute-force search (one matrix multiply per
    Arrow batch vs one interpreted fold per pair).

    The query side is collected once (it is the small side by
    contract — same asymmetry the broadcast join exploits) and shipped
    as a Spark broadcast variable. Each corpus batch computes
    batch×queries scores with a single ``V @ Q.T`` and emits only its
    LOCAL top-k per query; the global window then ranks
    k×num_partitions candidates per query — shuffle size is O(q·k·P),
    independent of corpus size.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    q_rows = queries.select(query_id, query_vec).collect()
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    Q /= np.linalg.norm(Q, axis=1, keepdims=True) + 1e-12
    bc = corpus.sparkSession.sparkContext.broadcast((qids, Q))

    out_schema = T.StructType(
        [
            T.StructField(query_id, T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def score(batches):
        b_qids, b_Q = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[corpus_vec]])
            V /= np.linalg.norm(V, axis=1, keepdims=True) + 1e-12
            S = V @ b_Q.T  # (batch, queries)
            ids = pdf[corpus_id].to_numpy()
            top = min(k, len(ids))
            part = np.argpartition(-S, top - 1, axis=0)[:top]  # local top-k per query
            rows = []
            for j in range(S.shape[1]):
                for i in part[:, j]:
                    rows.append((int(b_qids[j]), int(ids[i]), float(S[i, j])))
            yield pd.DataFrame(rows, columns=[query_id, "neighbor_id", "score"])

    scored = corpus.select(corpus_id, corpus_vec).mapInPandas(score, out_schema)
    w = W.partitionBy(query_id).orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure python PRNG —
    computed once on the driver, shipped as literals)."""
    import math
    import random

    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def _srp_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Signed-random-projection bucket id: one bit per hyperplane."""
    bucket = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(vec, plane) >= 0, F.lit(1).cast("bigint")).otherwise(0)
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    dim: int = 64,
    n_planes: int = 8,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "q_emb",
    seed: int = 42,
) -> DataFrame:
    """Approximate k-NN via signed-random-projection LSH: bucket both
    sides by hyperplane sign pattern, equi-join on the bucket, rank
    within candidates.

    Scale: turns the cross product into an equi-join on a 2^n_planes-ary
    key — corpus scored per query shrinks ~2^n_planes×. Recall is
    tunable (fewer planes → bigger buckets → higher recall/cost).

    Candidate rescoring hoists norms below the bucket join (one dot
    fold per candidate pair; see ``knn_exact``).
    """
    planes = _random_hyperplanes(dim, n_planes, seed)
    c = corpus.withColumn(
        "__bucket", _srp_bucket(F.col(corpus_vec), planes)
    ).withColumn("__nrm_c", l2_norm(F.col(corpus_vec)))
    q = queries.withColumn(
        "__bucket", _srp_bucket(F.col(query_vec), planes)
    ).withColumn("__nrm_q", l2_norm(F.col(query_vec)))
    scored = c.join(F.broadcast(q), "__bucket").select(
        F.col(query_id),
        F.col(corpus_id).alias("neighbor_id"),
        (
            dot(F.col(corpus_vec), F.col(query_vec))
            / (F.col("__nrm_c") * F.col("__nrm_q"))
        ).alias("score"),
    )
    w = W.partitionBy(query_id).orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _assign_cells(
    df: DataFrame, cent_df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Nearest-centroid assignment as a ``max_by`` groupBy aggregation:
    (id, vec, cell_id) with cell_id = argmax cosine(vec, centroid),
    ties broken toward the smaller cell_id.

    The crossJoin×n_cells expansion is streamed through a hash
    aggregate in the SAME stage (map-side partial agg), so the shuffle
    carries one row per input vector — a row_number window here would
    shuffle the full n_cells× expansion. first(vec) is deterministic:
    every row in a group carries the identical vector.

    Scoring is ``dot / centroid_norm``, NOT full cosine: the row
    vector's own norm is constant across the centroids it is compared
    against, so dividing by it cannot change the argmax — dropping it
    removes two of three folds per (row, centroid) pair. The centroid
    norm is hoisted onto the (tiny, broadcast) centroid side.
    """
    cent_nrm = cent_df.withColumn("__cnrm", l2_norm(F.col("centroid")))
    return (
        df.crossJoin(F.broadcast(cent_nrm))
        .withColumn(
            "__sim", dot(F.col(vec_col), F.col("centroid")) / F.col("__cnrm")
        )
        .groupBy(id_col)
        .agg(
            F.first(vec_col).alias(vec_col),
            F.max_by(
                F.col("cell_id"),
                F.struct(F.col("__sim"), (-F.col("cell_id")).alias("__nc")),
            ).alias("cell_id"),
        )
    )


def kmeans_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    n_iters: int = 3,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Spherical k-means coarse quantizer learned with Lloyd iterations
    expressed as DataFrame jobs — the trained upgrade over the sampled
    centroids ``knn_ivf`` defaults to.

    Each iteration: (1) assign every corpus vector to its most-cosine-
    similar centroid (broadcast join + argmin window), (2) new centroid
    = per-cell elementwise mean (posexplode → (cell, pos) avg),
    unit-normalized. Centroids live driver-side between iterations —
    they are tiny by construction (n_cells × dim floats; the FAISS-style
    train/index split), so this is NOT a driver-side data loop; at
    100 TB you train on a sample and the per-iteration assign remains
    one broadcast-join scan.

    Empty cells keep their previous centroid. Deterministic: stratified
    init (first vector of each id % n_cells stratum), fixed iteration
    count, tie-break on cell_id.

    Assignment is a ``max_by`` groupBy aggregation, NOT a row_number
    window: hash aggregation partial-aggregates map-side, so the
    shuffle carries ONE row per corpus vector — a window over the
    corpus×centroids expansion would shuffle n_cells× the corpus.
    """
    import numpy as np

    spark = corpus.sparkSession
    w_strat = W.partitionBy(F.col(corpus_id) % n_cells).orderBy(corpus_id)
    init_rows = (
        corpus.withColumn("__rn", F.row_number().over(w_strat))
        .filter(F.col("__rn") == 1)
        .select(
            (F.col(corpus_id) % n_cells).cast("int").alias("cell_id"),
            F.col(corpus_vec).alias("centroid"),
        )
        .collect()
    )
    cents = {r.cell_id: np.asarray(r.centroid, dtype=np.float64) for r in init_rows}
    norm = lambda v: v / (np.linalg.norm(v) + 1e-12)  # noqa: E731
    cents = {c: norm(v) for c, v in cents.items()}

    for _ in range(n_iters):
        cent_df = spark.createDataFrame(
            [(c, [float(x) for x in v]) for c, v in sorted(cents.items())],
            "cell_id int, centroid array<float>",
        )
        assigned = _assign_cells(corpus, cent_df, corpus_id, corpus_vec)
        means = (
            assigned.select("cell_id", F.posexplode(F.col(corpus_vec)).alias("pos", "val"))
            .groupBy("cell_id", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new: dict[int, np.ndarray] = {}
        for r in means:
            new.setdefault(r.cell_id, np.zeros(len(next(iter(cents.values())))))[r.pos] = r.m
        cents = {c: norm(new[c]) if c in new else v for c, v in cents.items()}

    return spark.createDataFrame(
        [(c, [float(x) for x in v]) for c, v in sorted(cents.items())],
        "cell_id int, centroid array<float>",
    )


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_cells: int = 16,
    n_probe: int = 4,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "q_emb",
    seed: int = 42,
    centroids_df: DataFrame | None = None,
) -> DataFrame:
    """IVF-flat approximate k-NN: assign corpus vectors to their nearest
    of ``n_cells`` coarse centroids (sampled deterministically from the
    corpus itself — k-means-- style single pass); queries probe their
    ``n_probe`` nearest cells only.

    Scale: the centroid table is tiny and broadcast twice; the corpus is
    scanned once for assignment (cacheable/materializable as a bucketed
    table so repeated queries skip it) and the search join touches
    n_probe/n_cells of the data.

    ``centroids_df`` (cell_id, centroid) plugs in a trained quantizer
    (see ``kmeans_centroids``); default is the deterministic stratified
    sample — cheap, reproducible, good enough for a coarse quantizer.
    """
    if centroids_df is None:
        # first vector of every (id % n_cells) stratum
        w_strat = W.partitionBy(F.col(corpus_id) % n_cells).orderBy(corpus_id)
        centroids_df = (
            corpus.withColumn("__rn", F.row_number().over(w_strat))
            .filter(F.col("__rn") == 1)
            .select(
                (F.col(corpus_id) % n_cells).alias("cell_id"),
                F.col(corpus_vec).alias("centroid"),
            )
        )
    # Assign corpus rows to nearest centroid: max_by aggregation — the
    # shuffle carries one row per corpus vector, not the ×n_cells
    # expansion a window argmax would move (see _assign_cells).
    assigned = _assign_cells(corpus, centroids_df, corpus_id, corpus_vec).select(
        corpus_id, corpus_vec, "cell_id"
    )
    return ivf_search(
        assigned, queries, centroids_df, k, n_probe,
        corpus_id, corpus_vec, query_id, query_vec,
    )


def ivf_search(
    assigned: DataFrame,
    queries: DataFrame,
    centroids_df: DataFrame,
    k: int = 3,
    n_probe: int = 4,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "q_emb",
) -> DataFrame:
    """The probe+score half of IVF-flat over an ALREADY-ASSIGNED corpus
    ``(corpus_id, corpus_vec, cell_id)`` — the seam that lets a
    maintained assignment table (``streaming.vector_sink``) serve the
    same search as the one-shot ``knn_ivf``: identical expressions, so
    identical floats, so identical results given identical assignments.
    """
    assigned = assigned.withColumn("__nrm_c", l2_norm(F.col(corpus_vec)))

    # Queries probe their n_probe nearest cells. Ranking uses
    # dot / centroid_norm: the query's own norm is constant within its
    # rank partition, so it cannot reorder the probe list (see
    # _assign_cells).
    cent_nrm = F.broadcast(
        centroids_df.withColumn("__cnrm", l2_norm(F.col("centroid")))
    )
    probe_w = W.partitionBy(query_id).orderBy(F.desc("__sim"), F.asc("cell_id"))
    probes = (
        queries.withColumn("__nrm_q", l2_norm(F.col(query_vec)))
        .crossJoin(cent_nrm)
        .withColumn("__sim", dot(F.col(query_vec), F.col("centroid")) / F.col("__cnrm"))
        .withColumn("__r", F.row_number().over(probe_w))
        .filter(F.col("__r") <= n_probe)
        .select(query_id, query_vec, "__nrm_q", "cell_id")
    )

    # Final candidate scoring: one dot fold per pair, norms hoisted
    # per row on both sides.
    scored = assigned.join(F.broadcast(probes), "cell_id").select(
        F.col(query_id),
        F.col(corpus_id).alias("neighbor_id"),
        (
            dot(F.col(corpus_vec), F.col(query_vec))
            / (F.col("__nrm_c") * F.col("__nrm_q"))
        ).alias("score"),
    )
    w = W.partitionBy(query_id).orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
