"""Streaming-surface queries (SURVEY.md §2.7): genuine Structured Streaming
runs (readStream → stateful op → memory sink, AvailableNow trigger) exposed
through the batch query contract. Rows-only checks — streaming state
(watermark eviction, per-key GroupState) is not SQL-expressible, and the
batch-parity property is pinned separately in tests/test_streaming.py.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.queries import register
from ntd_gtfs_to_socrata_spark.streaming import event_windows as EW
from ntd_gtfs_to_socrata_spark.streaming import stateful as ST


def _run_to_table(df: DataFrame, prefix: str, mode: str) -> str:
    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    EW.run_available_now_to_memory(df, name, output_mode=mode)
    return name


@register("stream_dedupe_within_watermark")  # rows-only: stateful streaming
def stream_dedupe_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark over the events stream: first-wins per
    (user_id, event_type) while the key's state is inside the watermark.
    Returns one row per surviving event."""
    stream = EW.read_events_stream(spark, sf_dir)
    name = _run_to_table(
        ST.dedupe_within_watermark(stream, ["user_id", "event_type"]), "sdwm", "append"
    )
    return spark.table(name).select("user_id", "event_type", "event_id")


@register("stream_stateful_user_totals")  # rows-only: applyInPandasWithState
def stream_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user running
    (count, sum) state; final state per user returned."""
    stream = EW.read_events_stream(spark, sf_dir)
    name = _run_to_table(ST.running_user_totals(stream), "srut", "update")
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.round(F.max_by("total_value", "n_events"), 2).alias("total_value"),
        )
    )
