"""Small-files compaction for parquet lakes.

The lake-maintenance operator every long-running ingest (like the
reference's per-feed loop, publish_to_catalog.py:304-530 — one output per
feed per run) eventually needs: thousands of small files per partition
degrade scan planning (one task per file, footer overhead per file) until
someone bin-packs them back to ~target-sized files.

Scale posture:
- File inventory comes from the scan's hidden ``_metadata`` struct
  (file_path / file_size), NOT a driver-side filesystem walk — the listing
  is distributed and works on object stores where LIST is the bottleneck.
- The rewrite is ``repartition(ceil(total_bytes / target))`` — a single
  round-robin shuffle producing uniformly-sized outputs. With a sort key
  it becomes ``repartitionByRange(...).sortWithinPartitions(...)``, which
  preserves clustering so min/max row-group stats keep pruning (the
  poor-man's z-order for one dimension).
- Idempotent by construction: output to a fresh directory, swap pointers
  afterwards (the table-format commit a real lake does transactionally).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def file_inventory(spark: SparkSession, path: str) -> DataFrame:
    """Distributed file listing of a parquet dataset: one row per file
    with its size, from the scan's ``_metadata`` column."""
    return (
        spark.read.parquet(path)
        .select(
            F.col("_metadata.file_path").alias("file_path"),
            F.col("_metadata.file_size").alias("file_size"),
        )
        .distinct()
    )


def plan_compaction(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> tuple[int, int, int]:
    """Return (n_files, total_bytes, n_output_files) for a compaction run."""
    row = file_inventory(spark, path).agg(
        F.count(F.lit(1)).alias("n"), F.sum("file_size").alias("b")
    ).collect()[0]
    n_out = max(1, math.ceil((row["b"] or 0) / target_file_bytes))
    return int(row["n"]), int(row["b"] or 0), n_out


def compact(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
) -> int:
    """Rewrite ``src_path`` into ``dst_path`` as ~target-sized files.
    Returns the number of output partitions written."""
    _, _, n_out = plan_compaction(spark, src_path, target_file_bytes)
    df = spark.read.parquet(src_path)
    if sort_by:
        df = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(*sort_by)
    else:
        df = df.repartition(n_out)
    df.write.mode("overwrite").parquet(dst_path)
    return n_out
