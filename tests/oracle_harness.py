"""Local replica of the driver's differential check: run each registered
query on Spark and its oracle SQL on DuckDB over the same parquet, then
compare row count, column names, and the order-insensitive multiset of
row values. Used by tests and by ad-hoc ``python tests/oracle_harness.py``.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rag_lakehouse_spark.sources.tables import TABLES

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


# Int widths int8..int64 collapse to one canonical "int": the driver's
# value-hash tolerates them (r1 evidence: knn_similarity_join passed with
# Spark int32 vs DuckDB int64) because both export to Arrow as exact
# integers. HUGEINT (int128) stays distinct — DuckDB exports it as a
# different physical Arrow type, which is exactly what failed
# docs_by_lang_source / events_sessionize in round 1.
_SPARK_CANON = {
    "bigint": "int", "int": "int", "smallint": "int", "tinyint": "int",
    "double": "float64", "float": "float32", "string": "str", "boolean": "bool",
    "date": "date", "timestamp": "timestamp", "timestamp_ntz": "timestamp",
    "binary": "bytes",
}
_DUCK_CANON = {
    "bigint": "int", "hugeint": "int128", "integer": "int",
    "smallint": "int", "tinyint": "int", "ubigint": "uint64",
    "double": "float64", "float": "float32", "varchar": "str",
    "boolean": "bool", "date": "date", "timestamp": "timestamp",
    "timestamp with time zone": "timestamp", "blob": "bytes",
}


def _canon_spark_type(dt: str) -> str:
    dt = dt.strip().lower()
    if dt.startswith("array<") and dt.endswith(">"):
        return f"list<{_canon_spark_type(dt[6:-1])}>"
    if dt.startswith("decimal"):
        return dt.replace(" ", "")
    return _SPARK_CANON.get(dt, dt)


def _canon_duck_type(dt: str) -> str:
    dt = str(dt).strip().lower()
    if dt.endswith("[]"):
        return f"list<{_canon_duck_type(dt[:-2])}>"
    if dt.startswith("decimal"):
        return dt.replace(" ", "")
    return _DUCK_CANON.get(dt, dt)


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — exactness is the design goal
    if isinstance(v, bool):
        return str(v)
    return str(v)


def _row_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x1f".join(_norm_cell(r[i]) for i in order) for r in rows)


def compare(name: str, spark_df, con, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]
    d = con.sql(sql)
    d_cols = [c.lower() for c in d.columns]
    d_rows = d.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    # Typed comparison: the driver value-hashes typed cells (Arrow), so a
    # DuckDB HUGEINT vs Spark BIGINT divergence fails there even when the
    # stringified values match. Mirror that strictness here.
    s_types = {c.lower(): _canon_spark_type(t) for c, t in spark_df.dtypes}
    d_types = {c.lower(): _canon_duck_type(t) for c, t in zip(d.columns, d.types)}
    type_mismatch = {
        c: (s_types[c], d_types[c]) for c in s_types if s_types[c] != d_types[c]
    }
    if type_mismatch:
        problems.append(f"column types differ (spark, duck): {type_mismatch}")
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")
    sm = _row_multiset(s_cols, s_rows)
    dm = _row_multiset(d_cols, d_rows)
    if sm != dm:
        diff_s = [r for r in sm if r not in set(dm)][:3]
        diff_d = [r for r in dm if r not in set(sm)][:3]
        problems.append(
            f"values differ; spark-only sample={diff_s} duck-only sample={diff_d}"
        )
    return problems


def main() -> int:
    from rag_lakehouse_spark.plans import registry
    from rag_lakehouse_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("oracle_harness")
    con = duck_connection(SF_DIR)
    qs = registry.queries()
    oracles = registry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            try:
                n = fn(spark, SF_DIR).count()
                print(f"[rows-only] {name}: {n} rows")
            except Exception as exc:  # noqa: BLE001
                print(f"[FAIL] {name} (rows-only) -> {type(exc).__name__}: {exc}")
                failures += 1
            continue
        try:
            problems = compare(name, fn(spark, SF_DIR), con, oracles[name])
        except Exception as exc:  # noqa: BLE001
            problems = [f"exception: {type(exc).__name__}: {exc}"]
        status = "OK" if not problems else "FAIL"
        print(f"[{status}] {name}" + ("" if not problems else f" -> {problems}"))
        failures += bool(problems)
    print(f"\n{failures} failures / {len(qs)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
