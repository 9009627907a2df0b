"""Partition pruning (SURVEY.md §4): a lake table partitioned on the query
key must scan only matching partitions — the PartitionFilters path that, at
100 TB, turns a full-table scan into a single-day read."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.io import load_table


def plan_text(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    target = str(tmp_path / "events_by_day")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    ev.write.mode("overwrite").partitionBy("event_date").parquet(target)

    days = [r["event_date"] for r in spark.read.parquet(target).select("event_date").distinct().collect()]
    assert len(days) > 1, "fixture must span multiple partition days"
    one_day = sorted(days)[0]

    pruned = spark.read.parquet(target).filter(F.col("event_date") == one_day)
    plan = plan_text(pruned)
    # the partition predicate must land in PartitionFilters, NOT in the
    # row-level PushedFilters / post-scan Filter
    assert "PartitionFilters" in plan
    part_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "event_date" in part_line

    # pruning is real: the pruned count equals the per-day count and the
    # scan reads one partition directory
    n_day = pruned.count()
    n_all = spark.read.parquet(target).count()
    assert 0 < n_day < n_all


def test_compaction_bin_packs_small_files(spark, sf_dir, tmp_path):
    """50 tiny files → compaction plans ~total/target outputs, rewrites
    losslessly, and the sorted variant keeps the sort key clustered so
    row-group min/max stats stay prunable."""
    from ntd_gtfs_to_socrata_spark.io import load_table
    from ntd_gtfs_to_socrata_spark.operators import compaction as C

    src = str(tmp_path / "small_files")
    dst = str(tmp_path / "compacted")
    orders = load_table(spark, sf_dir, "orders")
    orders.repartition(50).write.parquet(src)

    n_files, total_bytes, n_out = C.plan_compaction(spark, src, target_file_bytes=1 << 30)
    assert n_files == 50
    assert n_out == 1

    # pack to ~quarter-of-total files: expect 4 outputs
    quarter = max(1, total_bytes // 4)
    assert C.compact(spark, src, dst, target_file_bytes=quarter, sort_by=["o_orderdate"]) == 4

    got = spark.read.parquet(dst)
    assert got.count() == orders.count()
    import glob
    assert len(glob.glob(dst + "/part-*.parquet")) == 4


def test_dpp_runtime_subquery(spark, sf_dir):
    """The broadcast-dim join over the date-partitioned staged events table
    must plan a dynamicpruning expression on the fact scan's partition
    column, and produce identical rows with DPP force-disabled."""
    from ntd_gtfs_to_socrata_spark.queries.layout_q import (
        layout_dpp_partition_prune,
    )

    df = layout_dpp_partition_prune(spark, sf_dir)
    plan = plan_text(df)
    assert "dynamicpruning" in plan.lower(), plan

    expected = sorted(map(tuple, df.collect()))
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    try:
        off = sorted(map(tuple, layout_dpp_partition_prune(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    assert off == expected
