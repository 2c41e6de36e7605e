"""Sorted-layout data skipping: the same pushed filter must read fewer
rows from a sort-clustered parquet table than from a shuffled one —
measured from the scan node's metrics, not assumed."""

from __future__ import annotations

from pyspark.sql import functions as F

from rag_lakehouse_spark.sources.layout import scan_rows_read, write_sorted
from rag_lakehouse_spark.sources.tables import load_table


def test_sorted_layout_skips_row_groups(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("layout")
    events = load_table(spark, sf_dir, "events")
    total = events.count()

    sorted_path = str(root / "sorted")
    shuffled_path = str(root / "shuffled")
    write_sorted(events, sorted_path, sort_col="user_id", n_files=4, row_group_mb=1)
    # adversarial layout: same data, random order
    events.orderBy(F.rand(seed=1)).coalesce(4).write.mode("overwrite").option(
        "parquet.block.size", 1024 * 1024
    ).parquet(shuffled_path)

    pred = F.col("user_id") == 7
    n_match = events.filter(pred).count()
    read_sorted = scan_rows_read(spark.read.parquet(sorted_path).filter(pred))
    read_shuffled = scan_rows_read(spark.read.parquet(shuffled_path).filter(pred))

    # correctness first: both layouts return identical matches
    assert spark.read.parquet(sorted_path).filter(pred).count() == n_match
    assert spark.read.parquet(shuffled_path).filter(pred).count() == n_match
    # the point: clustering makes min/max stats selective. The sorted
    # layout confines user_id=7 to few row groups; the shuffled one has
    # the key smeared over every row group, defeating skipping.
    assert read_sorted < read_shuffled, (read_sorted, read_shuffled, total)


def test_write_sorted_files_have_disjoint_ranges(spark, sf_dir, tmp_path_factory):
    import glob

    root = tmp_path_factory.mktemp("layout_ranges")
    path = str(root / "t")
    write_sorted(load_table(spark, sf_dir, "events"), path, "user_id", n_files=4)
    ranges = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        r = (
            spark.read.parquet(f)
            .agg(F.min("user_id").alias("lo"), F.max("user_id").alias("hi"))
            .collect()[0]
        )
        ranges.append((r.lo, r.hi))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # non-overlapping key ranges across files
