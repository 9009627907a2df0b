"""Plan-hygiene detector: un-partitioned WindowExec is the silent
scale-killer (whole input through ONE task). The detector must flag a
seeded global window and stay quiet on properly partitioned ones."""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo/tools")

from audit_plans import global_window_lines  # noqa: E402


def _physical(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("extended")
    plan = buf.getvalue()
    return plan[plan.index("== Physical Plan ==") :]


def test_detector_catches_seeded_global_window(spark):
    df = spark.range(100).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    hits = global_window_lines(_physical(df))
    assert hits, "global row_number over unpartitioned input must be flagged"


def test_detector_quiet_on_partitioned_window(spark):
    df = spark.range(100).withColumn("g", F.col("id") % 10)
    df = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("g").orderBy("id"))
    )
    assert global_window_lines(_physical(df)) == []


def test_detector_quiet_on_windowless_plan(spark):
    df = spark.range(100).groupBy((F.col("id") % 10).alias("g")).count()
    assert global_window_lines(_physical(df)) == []
