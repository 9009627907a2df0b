"""Plan-hygiene detector: un-partitioned WindowExec is the silent
scale-killer (whole input through ONE task). The detector must flag a
seeded global window and stay quiet on properly partitioned ones."""

from __future__ import annotations

import io
import subprocess
import sys
from contextlib import redirect_stdout

import pytest
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


@pytest.mark.slow
def test_full_registry_plan_audit():
    """The auditor over EVERY registered query (r5 verdict item 2): any
    un-allowlisted global window / BNLJ / cartesian / python-eval /
    exchange blowup fails the gate. The allowlists live in
    tools/audit_plans.py with per-query justifications — adding a new
    scale anti-pattern requires either fixing the plan or writing down
    why it is justified."""
    proc = subprocess.run(
        [sys.executable, "tools/audit_plans.py", "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=1800,
    )
    flagged = [line for line in proc.stdout.splitlines() if "!!" in line]
    assert proc.returncode == 0, "plan audit flagged:\n" + "\n".join(flagged)
