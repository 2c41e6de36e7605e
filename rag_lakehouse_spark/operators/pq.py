"""Product quantization (PQ) for memory-bound ANN at corpus scale.

The brute-force and IVF paths (operators.similarity) score full
``array<float>`` vectors; at 100 TB the index itself becomes the
bottleneck (64-dim float32 = 256 B/vector). PQ compresses each vector
to ``m`` one-byte codes (8 B/vector at m=8 — 32×) by k-means-quantizing
each of ``m`` subspaces independently, then scores queries against
codes with an asymmetric-distance lookup table (ADC): the query is NOT
quantized, so precision loss stays one-sided. (Jégou, Douze, Schmid,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011 — the
standard in FAISS/ScaNN-class systems.)

Spark-first split of the work:

- **train_pq** — k-means per subspace on a BOUNDED sample collected to
  the driver (the FAISS train/index split: codebooks are
  m × 2^bits × dim/m floats — parameters, not data; training on a
  sample is the standard practice).
- **pq_encode** — distributed Arrow-batched pandas UDF: one NumPy
  argmin per subspace per batch (BLAS), corpus-sized, map-only.
- **pq_search** — per query build the m × 2^bits ADC lookup table
  driver-side (tiny), broadcast it, and score codes with a vectorized
  take-and-sum per Arrow batch; per-partition top-k then global top-k,
  so the shuffle carries O(q·k·partitions) rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _kmeans_np(x: np.ndarray, k: int, n_iters: int, seed: int) -> np.ndarray:
    """Plain Lloyd's on a small in-memory sample (deterministic)."""
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=k, replace=len(x) < k)].astype(np.float64)
    for _ in range(n_iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents.astype(np.float32)


def train_pq(
    corpus: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    sample_rows: int = 2048,
    n_iters: int = 8,
    seed: int = 42,
) -> np.ndarray:
    """Learn the PQ codebooks: shape (m, k, dim//m) float32.

    Samples up to ``sample_rows`` vectors (deterministic limit over a
    hash-ordered projection so the sample is stable across runs and
    partitionings), then runs per-subspace Lloyd's driver-side.
    """
    assert dim % m == 0, "dim must divide into m equal subspaces"
    sub = dim // m
    rows = (
        corpus.select(vec_col)
        .orderBy(F.xxhash64(vec_col))
        .limit(sample_rows)
        .collect()
    )
    x = np.asarray([r[0] for r in rows], dtype=np.float32)
    return np.stack(
        [_kmeans_np(x[:, j * sub : (j + 1) * sub], k, n_iters, seed + j) for j in range(m)]
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, codes: array<int>, *keep_cols) — each vector's per-subspace
    nearest codebook entry. Distributed, Arrow-batched, BLAS argmin per
    batch. ``keep_cols`` pass through unchanged (e.g. an IVF cell id)."""
    m, k, sub = codebooks.shape
    cb = codebooks  # closed over; shipped once per executor via pickle

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            x = np.stack(s.to_numpy())  # (n, dim) float32
            codes = np.empty((len(x), m), dtype=np.int32)
            for j in range(m):
                xs = x[:, j * sub : (j + 1) * sub]
                # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; x-norm constant per row
                d = -2.0 * xs @ cb[j].T + (cb[j] ** 2).sum(axis=1)[None, :]
                codes[:, j] = d.argmin(axis=1)
            yield pd.Series(list(codes))

    return corpus.select(
        F.col(id_col), encode(F.col(vec_col)).alias("codes"), *keep_cols
    )


def pq_search(
    codes_df: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k_neighbors: int = 10,
    id_col: str = "vec_id",
    query_id: str = "query_id",
    query_vec: str = "q_emb",
) -> DataFrame:
    """ADC top-k: (query_id, neighbor_id, adc_distance, rank).

    The query side is collected driver-side (small by contract — same
    contract as knn_exact_vectorized's broadcast side) and turned into
    per-query lookup tables LUT[q][j][c] = ||q_j - codebook[j][c]||²;
    each Arrow batch of codes scores every query with a vectorized
    take-and-sum, keeps a local top-k, and the global top-k per query
    is a WindowGroupLimit-pruned rank — shuffle O(q·k·partitions).
    """
    m, kcent, sub = codebooks.shape
    cb = codebooks
    qrows = queries.select(query_id, query_vec).collect()
    qids = np.asarray([r[0] for r in qrows])
    qmat = np.asarray([r[1] for r in qrows], dtype=np.float32)
    # LUT: (n_q, m, kcent)
    lut = np.stack(
        [
            ((qmat[:, j * sub : (j + 1) * sub][:, None, :] - cb[j][None, :, :]) ** 2).sum(
                axis=2
            )
            for j in range(m)
        ],
        axis=1,
    )

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("adc_distance", T.DoubleType()),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            codes = np.stack(b["codes"].to_numpy())  # (n, m) int32
            ids = b[id_col].to_numpy()
            outs = []
            for qi in range(len(qids)):
                # take per-subspace LUT entries at the stored codes, sum
                d = lut[qi][np.arange(m)[None, :], codes].sum(axis=1)  # (n,)
                top = np.argsort(d, kind="stable")[:k_neighbors]
                outs.append(
                    pd.DataFrame(
                        {
                            "query_id": qids[qi],
                            "neighbor_id": ids[top],
                            "adc_distance": d[top].astype(np.float64),
                        }
                    )
                )
            yield pd.concat(outs, ignore_index=True)

    from pyspark.sql import Window as W

    local_topk = codes_df.mapInPandas(score, out_schema)
    w = W.partitionBy("query_id").orderBy(F.asc("adc_distance"), F.asc("neighbor_id"))
    return (
        local_topk.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_neighbors)
    )


def knn_ivf_pq(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k_neighbors: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 8,
    k_codes: int = 16,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "q_emb",
    centroids_df: DataFrame | None = None,
    sample_rows: int = 2048,
    seed: int = 42,
) -> DataFrame:
    """IVF-PQ: coarse quantizer restricts the search to ``n_probe`` of
    ``n_cells`` inverted lists, PQ codes of the RESIDUAL (vector minus
    its cell centroid) approximate the distance inside each probed
    list — the FAISS IVFADC composition, built from the two halves
    that already exist here (similarity.kmeans/_assign_cells + the PQ
    train/encode/ADC machinery).

    Residual encoding is exact in the decomposition
    ``||q - v||² = ||(q - cent(v)) - r(v)||²`` — only r is quantized,
    so the coarse quantizer's structure is not re-paid by the codes;
    the ADC lookup table is built per (query, probed cell) from the
    query's residual against that cell.

    Scale split: centroids and codebooks are driver-side PARAMETERS
    (n_cells×dim + m×k×dim/m floats); assignment and encoding are
    distributed map stages; search touches only the probed fraction
    of the code table (hash equi-join on cell id — the inverted-list
    read), and the shuffle after per-batch local top-k carries
    O(q · k · partitions) rows.
    """
    from rag_lakehouse_spark.operators.similarity import _assign_cells

    spark = corpus.sparkSession
    if centroids_df is None:
        from pyspark.sql import Window as W

        w_strat = W.partitionBy(F.col(corpus_id) % n_cells).orderBy(corpus_id)
        centroids_df = (
            corpus.withColumn("__rn", F.row_number().over(w_strat))
            .filter(F.col("__rn") == 1)
            .select(
                (F.col(corpus_id) % n_cells).cast("int").alias("cell_id"),
                F.col(corpus_vec).alias("centroid"),
            )
        )
    cent_rows = sorted(centroids_df.collect(), key=lambda r: r.cell_id)
    cent_ids = [r.cell_id for r in cent_rows]
    cent_mat = np.asarray([r.centroid for r in cent_rows], dtype=np.float32)
    cent_b = F.broadcast(
        spark.createDataFrame(
            [(int(c), [float(x) for x in v]) for c, v in zip(cent_ids, cent_mat)],
            "cell_id int, centroid array<float>",
        )
    )

    assigned = _assign_cells(corpus, cent_b, corpus_id, corpus_vec)
    residuals = assigned.join(cent_b, "cell_id").select(
        F.col(corpus_id),
        F.col("cell_id"),
        F.zip_with(corpus_vec, "centroid", lambda a, b: a - b).alias("__res"),
    )
    books = train_pq(
        residuals, dim, m=m, k=k_codes, vec_col="__res",
        sample_rows=sample_rows, seed=seed,
    )
    codes = pq_encode(residuals, books, corpus_id, "__res", keep_cols=("cell_id",))

    # query side: probe lists + per-(query, cell) residual ADC tables —
    # all parameter-sized (q × n_probe × m × k_codes floats).
    qrows = queries.select(query_id, query_vec).collect()
    qids = [r[0] for r in qrows]
    qmat = np.asarray([r[1] for r in qrows], dtype=np.float32)
    cn = cent_mat / (np.linalg.norm(cent_mat, axis=1, keepdims=True) + 1e-12)
    qn = qmat / (np.linalg.norm(qmat, axis=1, keepdims=True) + 1e-12)
    sims = qn @ cn.T  # cosine, same probe metric as knn_ivf
    sub = dim // m
    lut: dict[tuple[int, int], np.ndarray] = {}
    probe_pairs = []
    for qi, qid in enumerate(qids):
        order = np.lexsort((cent_ids, -sims[qi]))[:n_probe]
        for ci in order:
            cell = int(cent_ids[ci])
            probe_pairs.append((int(qid), cell))
            qres = qmat[qi] - cent_mat[ci]
            lut[(int(qid), cell)] = np.stack(
                [
                    (
                        (qres[j * sub : (j + 1) * sub][None, :] - books[j]) ** 2
                    ).sum(axis=1)
                    for j in range(m)
                ]
            )  # (m, k_codes)

    probes = F.broadcast(
        spark.createDataFrame(probe_pairs, f"{query_id} long, cell_id int")
    )
    probed = codes.join(probes, "cell_id")

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("adc_distance", T.DoubleType()),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            outs = []
            for (qid, cell), grp in b.groupby([query_id, "cell_id"], sort=False):
                table = lut[(int(qid), int(cell))]
                cds = np.stack(grp["codes"].to_numpy())  # (n, m)
                d = table[np.arange(table.shape[0])[None, :], cds].sum(axis=1)
                top = np.argsort(d, kind="stable")[:k_neighbors]
                outs.append(
                    pd.DataFrame(
                        {
                            "query_id": int(qid),
                            "neighbor_id": grp[corpus_id].to_numpy()[top],
                            "adc_distance": d[top].astype(np.float64),
                        }
                    )
                )
            yield pd.concat(outs, ignore_index=True) if outs else pd.DataFrame(
                {c.name: pd.Series(dtype="float64") for c in out_schema}
            )

    from pyspark.sql import Window as W

    local_topk = probed.mapInPandas(score, out_schema)
    w = W.partitionBy("query_id").orderBy(F.asc("adc_distance"), F.asc("neighbor_id"))
    return (
        local_topk.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_neighbors)
    )
