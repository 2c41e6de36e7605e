"""Layout-aware writes: sort-clustered parquet for min/max data
skipping.

Partitioning prunes directories; WITHIN a partition, the parquet reader
can still skip whole row groups using column min/max statistics — but
only if the writer clustered values so the stats are selective. A table
sorted by its hot filter key turns point/range predicates into
row-group skips (the poor man's Z-order; for one key it is exactly
optimal, Z-order only wins for multi-key filters).

At 100 TB: repartitionByRange gives non-overlapping file ranges across
the cluster (each task writes a distinct key range), sortWithinPartitions
orders rows inside each file, and ``parquet.block.size`` controls skip
granularity. The effect is measured, not assumed — see
tests/test_layout.py, which asserts the scan reads fewer rows from the
sorted layout than from the shuffled one under the same pushed filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_sorted(
    df: DataFrame,
    path: str,
    sort_col: str,
    n_files: int = 8,
    row_group_mb: int = 1,
) -> str:
    """Range-partition by ``sort_col`` into ``n_files`` non-overlapping
    files, sorted within each, with small row groups so min/max skipping
    has granularity. Returns the path."""
    (
        df.repartitionByRange(n_files, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .option("parquet.block.size", row_group_mb * 1024 * 1024)
        .parquet(path)
    )
    return path


def scan_rows_read(df: DataFrame) -> int:
    """Rows actually produced by the parquet scan node after pushdown +
    row-group skipping (execute the plan, then read the scan metric).
    Test/diagnostic helper for verifying a layout actually skips."""
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
