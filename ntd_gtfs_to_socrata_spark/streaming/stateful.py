"""Custom stateful streaming operators (SURVEY.md §2.7 extension surface).

The reference has no streaming state at all — its rerun-the-full-diff batch
(publish_to_catalog.py:261-288) is what these replace incrementally:

- ``dedupe_within_watermark``: stateful key dedupe whose state is evicted
  once the watermark passes — bounded memory on an unbounded stream (the
  scale-correct version of a global ``dropDuplicates``).
- ``running_user_totals``: an operator Spark's built-ins don't express —
  arbitrary per-key running state via ``applyInPandasWithState`` (Arrow
  batches in, explicit GroupState, update-mode emission per micro-batch).

Scale posture: state lives in the executor state store partitioned by the
group key, so both operators scale horizontally with key cardinality;
watermarks (resp. state timeouts) bound per-key state lifetime.
"""

from __future__ import annotations

# NOTE: Spark 4's successor API (``transformWithStateInPandas`` — ValueState/
# ListState/MapState + timers) is present in this PySpark build but its
# state-server protocol requires ``google.protobuf``, which this container
# does not ship (verified: the driver worker crashes with ImportError on
# protobuf descriptor import). ``applyInPandasWithState`` below is the
# supported custom-state surface here; the operator bodies port 1:1 once
# protobuf is available.

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedupe_within_watermark(
    events: DataFrame, keys: list[str], watermark: str = "1 hour"
) -> DataFrame:
    """First-wins key dedupe with watermark-bounded state: a key's
    state entry is dropped once the watermark passes its event time, so
    re-occurrences *after* that are treated as new — the streaming analog
    of the reference's per-run idempotency window."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) via applyInPandasWithState.

    Each micro-batch, every user's new rows arrive as Arrow-backed pandas
    frames; state carries the running pair forward; one updated row per
    user per batch is emitted (update mode). This is the template for any
    custom stateful operator the built-in aggregates can't express
    (decaying counters, per-key model state, sessionized enrichment).
    """
    import pandas as pd  # noqa: PLC0415

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
