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
