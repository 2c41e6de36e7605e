"""Graph ANN: a frozen small-world-style neighbor graph walked by
greedy beam search — the index family HNSW/NSW deployments actually
serve at recall > 0.9, closing the ANN ladder above SRP-LSH / IVF /
PQ / IVF-PQ / IVF-SQ (operators/similarity.py, operators/pq.py).

The frozen-artifact trick, third application (after the PQ codebook
and the IVF-SQ range table): the GRAPH IS DATA — a deterministic
(src, dst) adjacency table — and the WALK IS PLAN — a fixed number of
beam-search rounds, each one bounded join + top-B cut. Both halves are
SQL-expressible, so the candidate set AND its order are externally
hash-checked (``ann_graph_portable``), which no trained HNSW can be.

Search semantics (round-synchronous beam search, the parallel NSW
variant): start from a FIXED SET of entry nodes spread across the id
range (multi-entry is the flat-graph substitute for HNSW's upper
layers — measured here: single-entry recall@10 plateaus at 0.3-0.4 on
the isotropic corpus, four entries at beam 24 reach 0.8-0.9 across
SFs); each round expands the whole beam's out-neighbors, scores
frontier ∪ beam against the query, and keeps the top-B under the
total order (score DESC, vec_id ASC). The beam is monotone
non-worsening (it always re-includes itself), so a converged beam is
a local optimum of the graph exactly like greedy NSW search;
round-synchronous expansion trades HNSW's sequential visit queue for
bulk parallelism — the standard reformulation for batch engines.

Scale (100 TB): the graph is built OFFLINE like any index — at small
SF the exact all-pairs top-M here; at corpus scale NN-descent or the
package's own LSH/IVF candidate machinery produces the same
(src, dst) table without the quadratic pass — and is stored
bucketed/sorted by src so each round's expansion is a co-located
equi-join. Per round the engine touches |beam|·M adjacency rows and
fetches |frontier| vectors (a broadcast semi-join against the
bucketed embeddings table = point lookups under sorted layout, never
a corpus scan per round at scale); beams are O(B) rows and eagerly
checkpointed so the iterative plan does not nest (the package's
iterative-lineage rule, operators/graph.py).

Reference parity: the reference serves ANN through its vector store
(src/api.py:10-84 querying chromadb, an HNSW index) — this re-expresses
the HNSW-style serving path as Spark plans over an explicit graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from rag_lakehouse_spark.functions import vector as VEC


def knn_graph(e_normed: DataFrame, m: int = 6) -> DataFrame:
    """The frozen M-NN adjacency (src, dst): for every node its ``m``
    most-cosine-similar others under the total order (sim DESC, dst
    ASC). ``e_normed`` must carry (vec_id, embedding, nrm) — norms
    hoisted once per side, the package's pairwise-score rule.

    This is the exact O(n²) build, right for the frozen/verifiable
    artifact at test SFs; the module docstring records the
    NN-descent/LSH build that replaces it at corpus scale (the WALK —
    the serving path — is unchanged either way)."""
    a = e_normed.select(
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
    )
    b = e_normed.select(
        F.col("vec_id").alias("dst"),
        F.col("embedding").alias("b_emb"),
        F.col("nrm").alias("b_nrm"),
    )
    pairs = a.join(b, F.col("src") != F.col("dst")).select(
        "src",
        "dst",
        (
            VEC.dot("a_emb", "b_emb")
            / (F.col("a_nrm") * F.col("b_nrm") + F.lit(1e-24))
        ).alias("sim"),
    )
    w = W.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= m)
        .select("src", "dst")
    )


def nsw_fwd_edges(
    src_vecs: DataFrame, dst_vecs: DataFrame, m: int = 8
) -> DataFrame:
    """(src, dst) forward edges under the NSW INSERT-ORDER rule: for
    each ``src_vecs`` vector, its exact top-m cosine neighbors among
    ``dst_vecs`` vectors with LOWER vec_id (vec_id order = insertion
    order). ONE definition shared by the frozen triangular build
    (``ann_graph_nsw_portable``: src = dst = corpus) and the
    incremental fold (``streaming.graph_sink``: src = batch, dst =
    maintained ∪ batch) — so the frozen and maintained adjacencies
    cannot drift. Inputs carry (vec_id, embedding, nrm) with the norm
    from ``functions.vector.l2_norm``."""
    a = src_vecs.select(
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
    )
    b = dst_vecs.select(
        F.col("vec_id").alias("dst"),
        F.col("embedding").alias("b_emb"),
        F.col("nrm").alias("b_nrm"),
    )
    wn = W.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
    return (
        a.join(b, F.col("dst") < F.col("src"))
        .select(
            "src",
            "dst",
            (
                VEC.dot("a_emb", "b_emb")
                / (F.col("a_nrm") * F.col("b_nrm") + F.lit(1e-24))
            ).alias("sim"),
        )
        .withColumn("rn", F.row_number().over(wn))
        .filter(F.col("rn") <= m)
        .select("src", "dst")
    )


def beam_search(
    graph: DataFrame,
    scores: DataFrame,
    entries: DataFrame,
    beam_width: int = 24,
    rounds: int = 6,
) -> DataFrame:
    """Round-synchronous greedy beam search over the frozen graph:
    (rank, vec_id, score) of the final beam, rank 1..beam_width under
    (score DESC, vec_id ASC). ``entries`` is the (vec_id) DataFrame of
    entry nodes — multiple entries stand in for HNSW's upper layers on
    a flat graph.

    ``scores`` is the LAZY (vec_id, score) relation scoring any node
    against the query; each round joins only the bounded frontier
    (≤ beam_width·(M+1) rows) against it, so under a bucketed/sorted
    embeddings layout the fetch is point lookups, and the beam —
    O(beam_width) rows — is eagerly checkpointed per round so the
    iterative plan never nests (the package's iterative-lineage
    rule)."""
    beam = entries.select("vec_id").distinct()
    for _ in range(rounds):
        frontier = beam.unionByName(
            beam.join(
                graph, beam["vec_id"] == graph["src"], "inner"
            ).select(F.col("dst").alias("vec_id"))
        ).distinct()
        scored = frontier.join(scores, "vec_id", "inner")
        beam = (
            scored.orderBy(F.desc("score"), F.asc("vec_id"))
            .limit(beam_width)
            .select("vec_id")
            .localCheckpoint(eager=True)
        )
    final = beam.join(scores, "vec_id", "inner")
    w = W.orderBy(F.desc("score"), F.asc("vec_id"))
    return final.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "vec_id",
        "score",
    )


def beam_search_py(
    adj: dict[int, list[int]],
    scores: dict[int, float],
    entries: list[int],
    beam_width: int = 24,
    rounds: int = 6,
) -> list[tuple[int, int, float]]:
    """Pure-Python referee for ``beam_search`` — same semantics, no
    Spark — so the walk is directly fuzzable (beam width, rounds,
    entry sets, graph shape) without a session."""
    beam = list(dict.fromkeys(entries))
    for _ in range(rounds):
        frontier = set(beam)
        for n in beam:
            frontier.update(adj.get(n, ()))
        ranked = sorted(
            ((nid, scores[nid]) for nid in frontier if nid in scores),
            key=lambda t: (-t[1], t[0]),
        )
        beam = [nid for nid, _ in ranked[:beam_width]]
    ranked = sorted(
        ((nid, scores[nid]) for nid in beam if nid in scores),
        key=lambda t: (-t[1], t[0]),
    )
    return [(i + 1, nid, s) for i, (nid, s) in enumerate(ranked)]
