"""Duplicate-cluster resolution: near-dup PAIRS (from MinHash-LSH /
SimHash / Jaccard) → connected components → one canonical doc per
cluster. The step that turns pairwise dedup signals into an actual
keep/drop decision for a training corpus.

Algorithm: iterative min-label propagation (each vertex adopts the
smallest id reachable through its edges) — the alternating large-star
style loop, expressed as joins. Converges in O(diameter) rounds;
near-dup graphs are overwhelmingly tiny cliques/chains, so a handful
of rounds suffice.

Scale notes: each round is one shuffle on the vertex id.
``localCheckpoint`` truncates the lineage every round — without it the
plan doubles each iteration and the job falls over long before the
data does. Convergence is checked with a cheap count of changed
labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 10,
) -> DataFrame:
    """(id_a, id_b) undirected edges → (node, component) where
    component is the smallest node id in the connected component.

    The bidirected edge set is built with ONE pass over ``pairs`` (an
    explode of both orientations), not a self-union — two references
    to the pairs plan would recompute its producer (often a full
    near-dup pipeline) once per orientation; see the self-join
    materialization rule in docs/SCALE.md."""
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(id_a).alias("src"), F.col(id_b).alias("dst")),
                    F.struct(F.col(id_b).alias("src"), F.col(id_a).alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        neighbor_labels = (
            edges.join(labels, edges.dst == labels.node)
            .select(edges.src.alias("node"), "component")
        )
        new_labels = (
            labels.select("node", "component")
            .union(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()  # truncate lineage: plans double per round otherwise
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_cluster_canonicals(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Full keep/drop decision: every doc gets (cluster_id, is_canonical);
    singletons (no near-dup edges) are their own canonical cluster."""
    comp = connected_components(pairs, id_a, id_b)
    out = df.select(id_col).join(
        comp.withColumnRenamed("node", id_col), id_col, "left"
    )
    cluster = F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id")
    labeled = out.select(F.col(id_col), cluster)
    return labeled.withColumn(
        "is_canonical", F.col(id_col) == F.col("cluster_id")
    )
