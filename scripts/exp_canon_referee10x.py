#!/usr/bin/env python3
"""Bounded-iteration DuckDB referee for the canonicals family at 10x
(VERDICT r15 #10 / r14 #5): independent connected components over the
deterministic n-gram-Jaccard pair graph, compared row-for-row with the
engine's `dup_components_exact` fold on the same 10x parquet.

Why not the registered recursive-CTE oracle at this scale: its `reach`
relation enumerates (node, reachable-root) PAIRS — quadratic in clique
size. The 10x corpus replicates texts verbatim, so every duplicate
clique is ~10x deeper and reach is ~100x sf0.1's; measured: >67 GB RSS
and still growing after 30 min. This referee instead runs BOUNDED
min-label propagation in DuckDB — labels start as the node id, each
iteration takes the min over the closed neighborhood (|V| rows per
iteration, |E| join work), and convergence is asserted within
MAX_ITERS (component diameter bound). Same fixpoint, linear state.

Two referees, both at 10x:

- ``ngram``: the oracled twin `dup_components_exact` vs the pair graph
  rebuilt from scratch in DuckDB. NOTE: this instance is DEGENERATE on
  the shipped corpus — the char-8-gram Jaccard>=0.5 pair graph is
  EMPTY at every SF (measured: 0 pairs at sf0.1 AND 10x; verbatim
  replication additionally pushes dup-cluster shingles past the
  df<=100 cap), so agreement here only pins the singleton path.
- ``minhash``: the family the debt is actually about —
  `dedup_cluster_canonicals` (rows-only MinHash edges, non-empty: 25
  pairs at sf0.1, far more at 10x). The EDGE SET is Spark's (its hash
  formulation is separately oracle-checked through the portable
  twins); the ITERATIVE COMPONENT FOLD — the part with no SQL oracle —
  is refereed independently: DuckDB ingests the edges and runs the
  same bounded min-label propagation, and the labelings must agree
  row-for-row.

Usage: python3 scripts/exp_canon_referee10x.py [ngram|minhash] [corpus_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

MODE = sys.argv[1] if len(sys.argv) > 1 else "ngram"
BIG = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.tmp_sfbig"
MAX_ITERS = 32  # >> observed near-dup component diameter (cliques/chains)


def _propagate(con: "duckdb.DuckDBPyConnection", n_edges: int) -> None:
    """Bounded min-label propagation over TEMP TABLE edges(a,b)
    (directed both ways); leaves the fixpoint in TEMP TABLE lab."""
    con.execute(
        "CREATE TEMP TABLE lab AS SELECT DISTINCT a AS node, a AS label FROM edges"
    )
    for it in range(1, MAX_ITERS + 1):
        con.execute(
            """
            CREATE TEMP TABLE lab_next AS
            SELECT l.node,
                   LEAST(l.label, MIN(ln.label)) AS label
            FROM lab l
            JOIN edges e ON e.a = l.node
            JOIN lab ln ON ln.node = e.b
            GROUP BY l.node, l.label
            """
        )
        changed = con.execute(
            """
            SELECT COUNT(*) FROM lab l JOIN lab_next n USING (node)
            WHERE l.label <> n.label
            """
        ).fetchone()[0]
        con.execute("DROP TABLE lab")
        con.execute("ALTER TABLE lab_next RENAME TO lab")
        if changed == 0:
            print(f"referee converged in {it} iterations over {n_edges} directed edges")
            return
    raise SystemExit(f"NOT CONVERGED within {MAX_ITERS} iterations")


def duck_components() -> list[tuple]:
    from rag_lakehouse_spark.functions.text import duckdb_char_shingles

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{BIG}/documents.parquet')"
    )
    # the same deterministic pair graph as the registered oracle
    con.execute(
        f"""
        CREATE TEMP TABLE edges AS
        WITH sh AS (
          SELECT doc_id, unnest({duckdb_char_shingles('text', 8)}) AS shingle
          FROM documents
        ),
        sized AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 100),
        cand AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
          FROM sh a
          JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          JOIN rare r ON a.shingle = r.shingle
          GROUP BY a.doc_id, b.doc_id
        ),
        jac AS (
          SELECT doc_a, doc_b FROM cand
          JOIN sized sa ON sa.doc_id = doc_a
          JOIN sized sb ON sb.doc_id = doc_b
          WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.5
        )
        SELECT doc_a AS a, doc_b AS b FROM jac
        UNION SELECT doc_b, doc_a FROM jac
        """
    )
    n_edges = con.execute("SELECT COUNT(*) FROM edges").fetchone()[0]
    _propagate(con, n_edges)
    return con.execute(
        """
        SELECT d.doc_id,
               COALESCE(l.label, d.doc_id) AS cluster_id,
               d.doc_id = COALESCE(l.label, d.doc_id) AS is_canonical
        FROM documents d LEFT JOIN lab l ON l.node = d.doc_id
        """
    ).fetchall()


def main() -> None:
    from rag_lakehouse_spark.plans.registry import queries
    from rag_lakehouse_spark.session import get_spark

    spark = get_spark("canon_referee10x")
    if MODE == "ngram":
        want = sorted(map(tuple, duck_components()))
        got = sorted(
            map(tuple, queries()["dup_components_exact"](spark, BIG).collect())
        )
        qname = "dup_components_exact"
    else:  # minhash: referee the iterative fold behind the rows-only family
        from rag_lakehouse_spark.operators.dedup import minhash_lsh_pairs
        from rag_lakehouse_spark.sources.tables import load_table

        d = load_table(spark, BIG, "documents")
        pairs = minhash_lsh_pairs(
            d, text_col="text", id_col="doc_id", threshold=0.5
        ).collect()
        con = duckdb.connect()
        con.execute("CREATE TEMP TABLE p (a BIGINT, b BIGINT)")
        con.executemany(
            "INSERT INTO p VALUES (?, ?)", [(r[0], r[1]) for r in pairs]
        )
        con.execute(
            "CREATE TEMP TABLE edges AS SELECT a, b FROM p UNION SELECT b, a FROM p"
        )
        n_edges = con.execute("SELECT COUNT(*) FROM edges").fetchone()[0]
        _propagate(con, n_edges)
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{BIG}/documents.parquet')"
        )
        want = sorted(
            map(
                tuple,
                con.execute(
                    """
                    SELECT d.doc_id,
                           COALESCE(l.label, d.doc_id) AS cluster_id,
                           d.doc_id = COALESCE(l.label, d.doc_id) AS is_canonical
                    FROM documents d LEFT JOIN lab l ON l.node = d.doc_id
                    """
                ).fetchall(),
            )
        )
        got = sorted(
            map(tuple, queries()["dedup_cluster_canonicals"](spark, BIG).collect())
        )
        qname = "dedup_cluster_canonicals"
    assert got == want, (
        f"{qname} fold diverges from bounded-iteration referee at 10x "
        f"({len(got)} vs {len(want)} rows; first diff: "
        f"{next((g, w) for g, w in zip(got, want) if g != w)})"
    )
    print(f"{qname}@10x == bounded-iteration DuckDB referee: {len(got)} rows")


if __name__ == "__main__":
    main()
