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

from ntd_gtfs_to_socrata_spark.io import load_table
from ntd_gtfs_to_socrata_spark.queries import register
from ntd_gtfs_to_socrata_spark.streaming import event_windows as EW
from ntd_gtfs_to_socrata_spark.streaming import joins as SJ
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


STREAM_STATIC_ORACLE = """
SELECT e.event_id, e.user_id, round(t.lifetime_value, 2) AS lifetime_value
FROM events e
JOIN (SELECT user_id, sum(value) AS lifetime_value
      FROM events GROUP BY user_id) t
  ON e.user_id = t.user_id
WHERE e.event_type = 'purchase'
"""


@register("stream_static_enrich", STREAM_STATIC_ORACLE)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment, the third streaming join shape next to
    stream-stream (above) and stateful (stateful.py): the purchase stream
    joined to a STATIC broadcast dimension (per-user lifetime value,
    computed once from the batch snapshot). Stream-static inner joins are
    stateless — each micro-batch probes the broadcast table and emits
    immediately, no watermark or join state — which is why this is the
    recommended shape for slowly-changing dims at 100 TB/day stream
    volume: dim refresh is a foreachBatch re-broadcast, never a shuffle
    of the stream. Emits exactly the batch join rows, so it is fully
    value-hash checked against the SQL oracle."""
    dim = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.sum("value").alias("lifetime_value"))
    )
    stream = EW.read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    enriched = stream.join(F.broadcast(dim), "user_id").select(
        "event_id", "user_id", F.round("lifetime_value", 2).alias("lifetime_value")
    )
    name = _run_to_table(enriched, "sse", "append")
    return spark.table(name)


INTERVAL_JOIN_ORACLE = """
SELECT c.event_id AS click_id, p.event_id AS purchase_id,
       p.user_id AS user_id,
       date_diff('second', c.ts, p.ts) AS delay_sec
FROM events c JOIN events p ON c.user_id = p.user_id
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
  AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 30 MINUTE
"""


@register("ss_interval_join_batch", INTERVAL_JOIN_ORACLE)
def ss_interval_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the click→purchase attribution interval join
    (streaming/joins.py): one shuffle on user_id, the time-range predicate
    evaluated inside the join."""
    ev = load_table(spark, sf_dir, "events")
    return SJ.click_purchase_interval_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )


@register("stream_interval_join", INTERVAL_JOIN_ORACLE)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME join run as a genuine stream-stream join (readStream both
    sides, watermarks bounding join state, AvailableNow trigger, memory
    sink). Inner stream-stream joins emit exactly the batch matches, so
    this one is fully value-hash checked against the SQL oracle — the
    strongest correctness statement the streaming surface gets."""
    clicks = EW.read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "click"
    ).withWatermark("ts", "1 hour")
    purchases = EW.read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    ).withWatermark("ts", "1 hour")
    joined = SJ.click_purchase_interval_join(clicks, purchases)
    name = _run_to_table(joined, "ssij", "append")
    return spark.table(name)
