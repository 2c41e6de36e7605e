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


def triangle_counts(
    edges: DataFrame, id_a: str = "a", id_b: str = "b"
) -> DataFrame:
    """Per-node triangle counts over an undirected edge set (one row
    per edge, ``id_a < id_b``), via DEGREE ORIENTATION — the standard
    scale trick: direct every edge from the (degree, id)-smaller
    endpoint to the larger, so every triangle is enumerated exactly
    once from its lowest-order corner and each wedge join fans out by
    a node's OUT-degree, which orientation bounds by O(sqrt(|E|))
    even for hub nodes (a plain neighbor join fans out by total
    degree — quadratic in the hub). Returns (node, degree,
    n_triangles) for every node with degree ≥ 1.

    The edge set is consumed by four plans (degrees, orientation, the
    wedge self-join, the closing check) — eager localCheckpoint per
    the multi-consumer rule. The one-row-per-edge ``id_a < id_b``
    contract is ENFORCED here (least/greatest normalize, self-loop
    drop, distinct), not just documented: a duplicate or reversed
    input row would silently inflate degrees and double-count wedges
    — same defense integer_pagerank applies."""
    e = (
        edges.select(
            F.least(F.col(id_a), F.col(id_b)).alias("a"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = e.select(F.col("a").alias("node")).unionAll(
        e.select(F.col("b").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    keyed = (
        e.join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = keyed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(
            a_first, F.struct(F.col("db").alias("d"), F.col("b").alias("i"))
        )
        .otherwise(F.struct(F.col("da").alias("d"), F.col("a").alias("i")))
        .alias("dst_key"),
    ).localCheckpoint(eager=True)
    w1 = oriented.select("src", F.col("dst").alias("v"), F.col("dst_key").alias("vk"))
    w2 = oriented.select("src", F.col("dst").alias("w"), F.col("dst_key").alias("wk"))
    wedges = w1.join(w2, "src").filter(F.col("vk") < F.col("wk")).select(
        "src", "v", "w"
    )
    closing = oriented.select(
        F.col("src").alias("v"), F.col("dst").alias("w")
    )
    tris = wedges.join(closing, ["v", "w"], "left_semi")
    per_node = (
        tris.select(F.explode(F.array("src", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return deg.join(per_node, "node", "left").select(
        "node",
        F.col("deg").cast("bigint").alias("degree"),
        F.coalesce(F.col("n_triangles"), F.lit(0)).cast("bigint").alias("n_triangles"),
    )
