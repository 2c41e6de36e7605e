"""Graph operators as DataFrame iterations (no GraphFrames/GraphX
dependency): PageRank by power iteration, joined per round.

Cross-engine exactness trick: classic PageRank is double arithmetic,
and the per-node SUM over incoming contributions is order-dependent in
floats — unverifiable against an external engine. This implementation
runs in scaled INTEGER arithmetic instead: ranks start at SCALE
(10^12), each round computes

    new_rank = (15 * SCALE + 85 * Σ_in (rank_src div out_deg_src)) div 100

— integer division throughout, every operation associative and exact,
so a SQL engine (chained CTEs) reproduces the fixpoint bit-for-bit.
The div-truncation error per contribution is < 1 part in 10^12 of the
rank mass: numerically irrelevant, deterministically priceless.

Scale: each round = one (src-keyed) join + one (dst-keyed) shuffle;
lineage is checkpoint-truncated per round like connected_components.
Rank mass is nodes × SCALE — with bigint partial sums this holds to
~10^6 nodes at SCALE=10^12; shrink SCALE as the graph grows (the
ordering, which is what PageRank is for, is insensitive).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000


def integer_pagerank(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Directed ``edges`` (src, dst) → (node, rank) after a fixed
    number of power-iteration rounds in exact integer arithmetic
    (damping 0.85, teleport 0.15, scaled by 10^12). Nodes must all
    have out-degree ≥ 1 (feed a bidirected edge set, as the registered
    query does, or handle dangling mass upstream)."""
    # materialize the edge set and degree table once: both are consumed
    # every iteration, and without the barrier each round would re-run
    # the caller's edge-construction plan (docs/SCALE.md self-join rule)
    e = (
        edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.groupBy(F.col("e_src").alias("deg_src"))
        .agg(F.count(F.lit(1)).alias("out_deg"))
        .localCheckpoint(eager=True)
    )
    ranks = deg.select(F.col("deg_src").alias("node"), F.lit(SCALE).alias("rank"))
    for _ in range(iterations):
        contribs = (
            ranks.join(deg, F.col("node") == F.col("deg_src"))
            .join(e, F.col("node") == F.col("e_src"))
            .select(F.col("e_dst"), F.expr("rank div out_deg").alias("c"))
        )
        ranks = (
            contribs.groupBy(F.col("e_dst").alias("node"))
            .agg(F.sum("c").alias("s"))
            .select(
                "node",
                F.expr(f"(15 * {SCALE}L + 85 * s) div 100").alias("rank"),
            )
            .localCheckpoint(eager=True)  # truncate per-round lineage
        )
    return ranks


def bounded_path_counts(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
) -> DataFrame:
    """Bounded-depth BFS path counting in aggregated-frontier form:
    from ``seeds`` (one row per start node) over directed ``edges``,
    return (node, hops, n_paths) where ``hops`` is the minimum walk
    length ≤ ``max_hops`` reaching the node and ``n_paths`` the total
    number of distinct walks of any length ≤ ``max_hops`` ending there.

    Identical answer to the recursive-CTE formulation that materializes
    one row per walk (``WITH RECURSIVE reach ... GROUP BY node``), but
    every intermediate is aggregated per level: level k holds one row
    per reachable node with the count of length-k walks, so row counts
    are bounded by |nodes| per level instead of growing combinatorially
    with graph density. Each level is one node-keyed equi-join plus one
    map-side-combining sum; lineage is checkpoint-truncated per level.
    This is the 100 TB-scale path the recursive CTE cannot take."""
    # consumed once per level — materialize so the caller's
    # edge-construction plan runs once, not max_hops times
    e = edges.select(
        F.col(src).alias("e_src"), F.col(dst).alias("e_dst")
    ).localCheckpoint(eager=True)
    level = seeds.select(
        F.col(node).alias("node"), F.lit(1).cast("long").alias("n_paths")
    )
    levels = [level.withColumn("hops", F.lit(0))]
    for k in range(1, max_hops + 1):
        level = (
            level.join(e, F.col("node") == F.col("e_src"))
            .groupBy(F.col("e_dst").alias("node"))
            .agg(F.sum("n_paths").alias("n_paths"))
            .localCheckpoint(eager=True)  # truncate per-level lineage
        )
        levels.append(level.withColumn("hops", F.lit(k)))
    all_levels = reduce(DataFrame.unionByName, levels)
    return all_levels.groupBy("node").agg(
        F.min("hops").cast("int").alias("hops"),
        F.sum("n_paths").alias("n_paths"),
    )
