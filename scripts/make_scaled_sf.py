#!/usr/bin/env python3
"""Generate a scaled-up replica dataset for heavy-tail boundary
sweeps (r14, VERDICT r13 #7): no sf1.0 directory ships with the
harness, so this replicates /root/testdata/sf0.1 K times (default 10
— an sf1.0-equivalent row volume) with shifted key DOMAINS so
referential structure survives:

- fact/entity keys (custkey, suppkey, partkey, orderkey, doc_id,
  vec_id, event_id, user_id) shift by replica*OFFSET — joins stay
  1:1 per replica;
- the tiny dims (region, nation) stay SINGLE-copy, so dim joins fan
  out 10x — exactly how real scale-up behaves;
- document texts replicate VERBATIM: dedup families face 10x-deep
  duplicate clusters (hot-key stress for the LSH/banding paths);
- embeddings get a replica-dependent +i*1e-3 element perturbation
  (breaks exact-cosine ties; replica 0 is bit-identical to sf0.1);
- event timestamps replicate verbatim: time buckets get 10x hotter
  (rollup/window hot-bucket stress) while shifted user_ids keep
  sessions distinct.

Usage: python3 scripts/make_scaled_sf.py [K] [outdir]
Defaults: K=10, outdir=/root/repo/.tmp_sfbig
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
KEY_OFFSET = 10_000_000
BIG_OFFSET = 100_000_000

SHIFTS: dict[str, dict[str, int]] = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": KEY_OFFSET},
    "supplier": {"s_suppkey": KEY_OFFSET},
    "part": {"p_partkey": KEY_OFFSET},
    "orders": {"o_orderkey": BIG_OFFSET, "o_custkey": KEY_OFFSET},
    "lineitem": {
        "l_orderkey": BIG_OFFSET,
        "l_partkey": KEY_OFFSET,
        "l_suppkey": KEY_OFFSET,
    },
    "events": {"event_id": BIG_OFFSET, "user_id": KEY_OFFSET},
    "documents": {"doc_id": KEY_OFFSET},
    "embeddings": {"vec_id": KEY_OFFSET},
}


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.tmp_sfbig"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table, shifts in SHIFTS.items():
        src = f"read_parquet('{SRC}/{table}.parquet')"
        cols = [
            r[0]
            for r in con.sql(f"describe select * from {src}").fetchall()
        ]
        if not shifts:  # dims: single copy
            con.sql(
                f"COPY (SELECT * FROM {src}) TO '{out}/{table}.parquet'"
                " (FORMAT PARQUET)"
            )
            continue
        parts = []
        for i in range(k):
            sel = []
            for c in cols:
                if c in shifts:
                    sel.append(f"CAST({c} + {i * shifts[c]} AS BIGINT) AS {c}")
                elif table == "embeddings" and c == "embedding" and i:
                    sel.append(
                        f"list_transform(embedding,"
                        f" x -> CAST(x + {i} * 0.001 AS FLOAT)) AS embedding"
                    )
                else:
                    sel.append(c)
            parts.append(f"SELECT {', '.join(sel)} FROM {src}")
        union = " UNION ALL ".join(parts)
        con.sql(
            f"COPY ({union}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(
            f"select count(*) from read_parquet('{out}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
