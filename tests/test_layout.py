"""Sorted-layout data skipping: the same pushed filter must read fewer
rows from a sort-clustered parquet table than from a shuffled one —
measured from the scan node's metrics, not assumed."""

from __future__ import annotations

from pyspark.sql import functions as F

from rag_lakehouse_spark.sources.layout import write_sorted
from tests.plan_metrics import scan_rows_read
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


def test_zorder_layout_skips_on_both_dimensions(spark, sf_dir, tmp_path_factory):
    from pyspark.sql import functions as F

    from rag_lakehouse_spark.sources.layout import write_zordered
    from rag_lakehouse_spark.sources.tables import load_table

    root = tmp_path_factory.mktemp("zorder")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    z_path = write_zordered(
        li, str(root / "z"), "l_partkey", "l_suppkey",
        n_files=16, row_group_kb=64, bits=6,
    )
    a_path = str(root / "bykey")
    # single-column sort on partkey: adversarial for suppkey predicates
    (
        li.repartitionByRange(16, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024)
        .parquet(a_path)
    )


    total = li.count()
    part_max = li.agg(F.max("l_partkey")).collect()[0][0]
    supp_max = li.agg(F.max("l_suppkey")).collect()[0][0]
    part_pred = F.col("l_partkey") < max(1, part_max // 20)
    supp_pred = F.col("l_suppkey") < max(1, supp_max // 20)

    z = spark.read.parquet(z_path)
    a = spark.read.parquet(a_path)
    # partkey predicate: both layouts skip (z interleaves it; a sorts it)
    assert scan_rows_read(z.filter(part_pred)) < total
    assert scan_rows_read(a.filter(part_pred)) < total
    # suppkey predicate: ONLY the z-ordered layout skips meaningfully —
    # the partkey-sorted layout scatters suppkey across every row group
    z_supp = scan_rows_read(z.filter(supp_pred))
    a_supp = scan_rows_read(a.filter(supp_pred))
    assert z_supp < a_supp, (z_supp, a_supp)
    # and both layouts return identical data
    assert z.filter(supp_pred).count() == a.filter(supp_pred).count()


def test_zorder_key_interleaves_bits(spark):
    from pyspark.sql import functions as F

    from rag_lakehouse_spark.sources.layout import zorder_key

    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long").select(
        zorder_key("a", "b", bits=3).alias("z")
    )
    # a bits -> even positions (1,0,1 -> bits 0,2,4), b -> odd (1,1,0 -> bits 1,3)
    # z = a0<<0 | b0<<1 | a1<<2 | b1<<3 | a2<<4 | b2<<5
    #   = 1 + 2 + 0 + 8 + 16 + 0 = 27
    assert df.collect()[0].z == 27


def test_zorder_empty_and_negative_domains(spark, tmp_path_factory):
    """write_zordered must not crash on an empty input (int(None)
    regression) and must min-shift negative domains so the Morton
    interleave stays meaningful (shiftright on negative longs
    sign-extends, silently degrading clustering)."""
    from rag_lakehouse_spark.sources.layout import write_zordered

    root = tmp_path_factory.mktemp("zorder_edge")

    empty = spark.createDataFrame([], "a long, b long, v string")
    p_empty = write_zordered(empty, str(root / "empty"), "a", "b", n_files=1)
    assert spark.read.parquet(p_empty).count() == 0

    rows = [(i - 500, (i * 7919) % 1000 - 500, f"v{i}") for i in range(1000)]
    neg = spark.createDataFrame(rows, "a long, b long, v string")
    p_neg = write_zordered(neg, str(root / "neg"), "a", "b", n_files=4, bits=8)
    back = spark.read.parquet(p_neg)
    assert back.count() == 1000
    assert sorted(r.v for r in back.collect()) == sorted(r[2] for r in rows)
    # clustering sanity: a point predicate on either (negative-valued)
    # dimension must not read the whole table
    read_a = scan_rows_read(back.filter(F.col("a") == -499))
    read_b = scan_rows_read(back.filter(F.col("b") == -499))
    assert read_a < 1000 and read_b < 1000, (read_a, read_b)


def test_write_sharded_is_rerun_reproducible(spark, tmp_path):
    """Same (data, seed) → byte-identical export across reruns and
    input partitionings; different seed → different order. Shard dirs
    exist and positions are dense 1..n per shard."""
    import os

    from rag_lakehouse_spark.sources.layout import shard_plan, write_sharded

    df = spark.range(0, 200).selectExpr("id AS doc_id", "id * 7 AS payload")

    p1 = str(tmp_path / "a")
    p2 = str(tmp_path / "b")
    write_sharded(df, p1, n_shards=4)
    write_sharded(df.repartition(13), p2, n_shards=4)  # partitioning must not matter
    r1 = sorted(spark.read.parquet(p1).collect())
    r2 = sorted(spark.read.parquet(p2).collect())
    assert r1 == r2
    assert sorted(os.listdir(p1))[0].startswith("_") or any(
        e.startswith("shard=") for e in os.listdir(p1)
    )

    plan = shard_plan(df, n_shards=4)
    per_shard = {
        r["shard"]: r["mx"]
        for r in plan.groupBy("shard").agg(F.max("pos").alias("mx"),
                                           F.count("*").alias("n"),).collect()
    }
    counts = {
        r["shard"]: r["n"]
        for r in plan.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    assert per_shard == counts  # dense positions: max == count per shard
    assert sum(counts.values()) == 200

    other = shard_plan(df, n_shards=4, seed=99)
    joined = plan.alias("a").join(
        other.alias("b"), F.col("a.doc_id") == F.col("b.doc_id")
    )
    moved = joined.filter(
        (F.col("a.shard") != F.col("b.shard")) | (F.col("a.pos") != F.col("b.pos"))
    ).count()
    assert moved > 100  # a new seed genuinely reshuffles
