"""Fixture-table loaders (SURVEY.md §2.1 S13).

All driver tables are parquet — the columnar, predicate-pushdown-friendly
scan path. At 100 TB the same ``spark.read.parquet`` call works against a
partitioned lake directory; Catalyst handles partition pruning, row-group
min/max skipping, and column pruning from the declared plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; known: {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize ``events.ts`` to session-TZ ``TimestampType`` regardless of
    the fixture's physical parquet type.

    Fixture generations have varied: TIMESTAMP(NANOS) (which Spark's
    vectorized reader only surfaces via ``nanosAsLong`` as a BIGINT) and
    plain ``timestamp[us]`` (surfaced as TIMESTAMP_NTZ). Branch on the
    *scanned* dtype instead of hard-coding one era's physical type — the
    loader contract is the logical schema, not the file encoding. Session
    timezone is pinned to UTC (session.py), so NTZ→TimestampType is a
    value-preserving cast and matches DuckDB's naive-timestamp reading."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        # nanos-as-long era: floor-convert to micros (DuckDB truncates too).
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL surface."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def ensure_min_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin rebalance a DataFrame whose source yields fewer
    partitions than cores.

    The fixture files are single-row-group parquet, so Spark's byte-range
    splitting cannot parallelize the scan: every downstream map (shingle
    explode, vector scoring) would run in ONE task. At 100 TB a lake
    directory has thousands of files and this is a no-op — the probe is
    ``df.inputFiles()`` (metadata from the analyzed plan's file index; no
    RDD conversion, no job). Costs one narrow-payload shuffle only when it
    buys a parallel map stage; callers apply it before expensive per-row
    work, never before a plain filter/agg (whose first exchange already
    spreads the load). Non-file-backed frames (inputFiles() == []) get the
    rebalance too — they are tiny test frames where the extra exchange is
    noise."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if len(df.inputFiles()) < min(target, 8):
        return df.repartition(target)
    return df


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str | list[str],
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist a table bucketed (and sorted) by its join key — the
    pre-partitioning that makes repeated joins on that key exchange-free
    (SURVEY.md §4: "co-locate joins via bucketing"). Both sides of a join
    bucketed on the same key with the same bucket count sort-merge without
    any shuffle; at 100 TB that removes the dominant cost of every
    fact⋈fact join the key participates in.

    Bucket count is a layout-time decision: it fixes the join parallelism
    floor, so size it to target-cluster cores (here: local cores)."""
    keys = [bucket_key] if isinstance(bucket_key, str) else list(bucket_key)
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table_name)
