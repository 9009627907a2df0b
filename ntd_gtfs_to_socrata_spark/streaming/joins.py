"""Stream-stream joins (SURVEY.md §2.7 — the remaining Structured
Streaming join surface).

The canonical attribution shape: click stream ⋈ purchase stream per user
within a bounded delay. The SAME expressions build the batch and streaming
plans; streaming adds watermarks on both sides so the join state store can
evict rows once no future match is possible.

Scale posture: both sides shuffle once on user_id; per-key state is bounded
by (watermark + join interval), so state size is O(rate × window), not
O(history). Inner joins emit matches immediately — watermarks only bound
state, they don't delay output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_interval_join(
    clicks: DataFrame, purchases: DataFrame, max_delay: str = "30 minutes"
) -> DataFrame:
    """Purchases attributed to the clicks they followed within ``max_delay``.

    Works on batch DataFrames and on watermarked streams unchanged — pass
    ``.withWatermark("ts", ...)`` inputs for the streaming form.
    """
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"), F.col("user_id"), F.col("ts").alias("p_ts")
    )
    cond = (
        (c.c_user == p.user_id)
        & (p.p_ts >= c.c_ts)
        & (p.p_ts < c.c_ts + F.expr(f"INTERVAL {max_delay}"))
    )
    return c.join(p, cond).select(
        "click_id",
        "purchase_id",
        "user_id",
        (F.col("p_ts").cast("long") - F.col("c_ts").cast("long")).alias("delay_sec"),
    )
