"""Connected-components / dedup-cluster tests with planted graphs."""

from __future__ import annotations

import pytest

from rag_lakehouse_spark.operators.clusters import (
    connected_components,
    dedup_cluster_canonicals,
)


def test_components_chain_and_clique(spark):
    # chain 1-2-3-4 (diameter 3), clique 10-11-12, isolated edge 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    comp = {r.node: r.component for r in connected_components(pairs).collect()}
    assert comp[1] == comp[2] == comp[3] == comp[4] == 1
    assert comp[10] == comp[11] == comp[12] == 10
    assert comp[20] == comp[21] == 20


def test_canonical_assignment_with_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    pairs = spark.createDataFrame([(2, 5), (5, 6)], "id_a long, id_b long")
    out = {r.doc_id: r for r in dedup_cluster_canonicals(docs, pairs).collect()}
    assert out[2].cluster_id == out[5].cluster_id == out[6].cluster_id == 2
    assert out[2].is_canonical and not out[5].is_canonical and not out[6].is_canonical
    for singleton in (1, 3, 4, 7):
        assert out[singleton].cluster_id == singleton and out[singleton].is_canonical
    # exactly one canonical per cluster
    canon = [r for r in out.values() if r.is_canonical]
    assert len({r.cluster_id for r in canon}) == len(canon) == 5


def test_integer_pagerank_star_graph(spark):
    from rag_lakehouse_spark.operators.graph import SCALE, integer_pagerank

    # star: hub 0 <-> leaves 1..4 (bidirected)
    edges = [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    ranks = {r.node: r.rank for r in integer_pagerank(df, iterations=5).collect()}
    assert set(ranks) == {0, 1, 2, 3, 4}
    # hub collects all leaf mass -> strictly highest; leaves symmetric
    assert ranks[0] > ranks[1]
    assert len({ranks[i] for i in range(1, 5)}) == 1
    # mass is conserved up to the integer-div truncation (< 1e-9 rel)
    total = sum(ranks.values())
    assert abs(total - 5 * SCALE) / (5 * SCALE) < 1e-9
    again = {r.node: r.rank for r in integer_pagerank(df, iterations=5).collect()}
    assert again == ranks


def test_bounded_path_counts_planted_graph(spark):
    from rag_lakehouse_spark.operators.graph import bounded_path_counts

    # seeds {0}; diamond 0->1, 0->2, 1->3, 2->3 plus spur 3->4.
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    out = {
        r.node: (r.hops, r.n_paths)
        for r in bounded_path_counts(edges, seeds, max_hops=2).collect()
    }
    # walks of length ≤2 from 0: [] (0), [1], [2], [1,3], [2,3]
    assert out == {0: (0, 1), 1: (1, 1), 2: (1, 1), 3: (2, 2)}


def test_recursive_cte_twin_matches_frontier(spark, sf_dir):
    """Bounded-scale check that the literal recursive-SQL twin (one row
    per walk — the formulation the registered query deliberately does
    NOT use at scale) produces the identical (node, hops, n_paths) set
    as the aggregated-frontier plan."""
    from rag_lakehouse_spark.plans.advanced_queries import (
        _RECURSIVE_BFS_SQL,
        recursive_cte_reach,
    )
    from rag_lakehouse_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    literal = {
        (r.node, r.hops, r.n_paths) for r in spark.sql(_RECURSIVE_BFS_SQL).collect()
    }
    frontier = {
        (r.node, r.hops, r.n_paths)
        for r in recursive_cte_reach(spark, sf_dir).collect()
    }
    assert literal == frontier
    assert len(frontier) > 0


def test_triangle_counts_match_bruteforce(spark):
    """Degree-oriented enumeration == brute force on graphs with hubs,
    cliques, ties in degree, and isolated edges."""
    from itertools import combinations

    from rag_lakehouse_spark.operators.graph import triangle_counts

    # K4 clique (0-3), a hub (10) joined to 0,1,4,5, a path 4-5-6,
    # an isolated edge 7-8
    edges = (
        list(combinations(range(4), 2))
        + [(0, 10), (1, 10), (4, 10), (5, 10)]
        + [(4, 5), (5, 6), (7, 8)]
    )
    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["node"]: (r["degree"], r["n_triangles"])
        for r in triangle_counts(df).collect()
    }

    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for n, nbrs in adj.items():
        t = sum(1 for v, w in combinations(sorted(nbrs), 2) if w in adj[v])
        want[n] = (len(nbrs), t)
    assert got == want
    assert got[0][1] == 4  # K4 corner: 3 clique triangles + (0,1,10)
    assert got[7] == (1, 0)
