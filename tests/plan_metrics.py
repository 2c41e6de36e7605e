"""Test-only plan-metric helpers (moved out of the library per
ADVICE r7: walking df._jdf.queryExecution().executedPlan() Scala
internals is brittle across Spark versions and has no place in a
production module — it exists to ASSERT layouts skip, not to run
pipelines). Verified against Spark 4.1."""

from __future__ import annotations

from pyspark.sql import DataFrame


def scan_rows_read(df: DataFrame) -> int:
    """Rows actually produced by the parquet scan node after pushdown +
    row-group skipping (execute the plan, then read the scan metric)."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()

    def find_scan(node):
        if node.nodeName().startswith("Scan parquet") or "FileScan" in node.nodeName():
            return node
        for i in range(node.children().length()):
            found = find_scan(node.children().apply(i))
            if found is not None:
                return found
        return None

    scan = find_scan(plan)
    if scan is not None:
        m = scan.metrics().get("numOutputRows")
        if not m.isEmpty():
            return m.get().value()
    raise RuntimeError(f"no parquet scan metric found in plan:\n{plan.toString()[:500]}")
