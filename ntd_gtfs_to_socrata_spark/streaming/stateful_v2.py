"""Spark 4 `transformWithStateInPandas` ports (r8 verdict task 6).

`transformWithStateInPandas` is the successor to `applyInPandasWithState`
— a `StatefulProcessor` class with named state variables (ValueState /
ListState / MapState), timers, and an explicit init/close lifecycle.
This module ports the repo's custom stateful operators to that API with
arithmetic IDENTICAL to `streaming/stateful.py`, so they share the same
bit-exact batch-parity oracles.

ENVIRONMENT GATE: the tWS Python worker talks to the JVM state server
through a protobuf protocol (`pyspark/sql/streaming/proto`), which needs
the `google.protobuf` runtime. This container does not ship it — a real
run fails with::

    StreamingPythonRunnerInitializationException: ... Traceback:
        from google.protobuf import descriptor as _descriptor
    ImportError: cannot import name 'descriptor' from 'google.protobuf'

(verified live in r9; pip installs are not allowed here). `tws_available()`
probes for the runtime; tests/test_streaming.py runs the parity check when
it returns True and pins the documented ImportError path otherwise, so the
port is exercised the moment the dependency appears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ntd_gtfs_to_socrata_spark.streaming.stateful import _trim_tail


def tws_available() -> bool:
    """True iff the google.protobuf runtime the tWS state-server protocol
    needs is importable (the API classes themselves always import)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_ewma_tws(events: DataFrame, span: int = 16) -> DataFrame:
    """Per-user bounded-window EWMA on `transformWithStateInPandas`:
    the state tail lives in a named ValueState variable instead of the
    positional GroupState tuple; emission arithmetic is byte-for-byte
    the `running_ewma` fold (alpha = 1/2, power-of-two weights, exact
    normalizer), so given the same time-ordered arrival the output is
    BIT-EXACT equal to the batch `tw_ewma_smoothed` window query — the
    same oracle, one API generation newer.

    Scale posture: identical to `running_ewma` — O(span) doubles per key
    in the state store, partitioned by user_id."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.stateful_processor import (  # noqa: PLC0415
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class EwmaProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            # named state variable with an explicit schema — the v2
            # facility applyInPandasWithState expressed positionally
            self._tail = handle.getValueState("tail", "tail array<double>")

        def handleInputRows(self, key, rows, timerValues):
            tail: list[float] = (
                list(self._tail.get()[0]) if self._tail.exists() else []
            )
            pdf = pd.concat(list(rows), ignore_index=True).sort_values(
                ["ts", "event_id"]
            )
            out_eid: list[int] = []
            out_ewma: list[float] = []
            for eid, v in zip(pdf["event_id"], pdf["value"]):
                tail.append(float(v))
                win = tail[-span:]
                s = len(win)
                acc = 0.0
                for j, x in enumerate(win):
                    acc += x * 2.0 ** -(s - 1 - j)
                out_eid.append(int(eid))
                out_ewma.append(acc / (2.0 - 2.0 ** -(s - 1)))
            self._tail.update((_trim_tail(tail, span),))
            yield pd.DataFrame(
                {"user_id": key[0], "event_id": out_eid, "ewma": out_ewma}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        EwmaProcessor(),
        outputStructType="user_id long, event_id long, ewma double",
        outputMode="Update",
        timeMode="None",
    )


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) — the `running_user_totals` template
    on the v2 API: two named ValueState variables instead of one
    positional tuple."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.stateful_processor import (  # noqa: PLC0415
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n", "n long")
            self._total = handle.getValueState("total", "total double")

        def handleInputRows(self, key, rows, timerValues):
            n = self._n.get()[0] if self._n.exists() else 0
            total = self._total.get()[0] if self._total.exists() else 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._n.update((n,))
            self._total.update((total,))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        TotalsProcessor(),
        outputStructType="user_id long, n_events long, total_value double",
        outputMode="Update",
        timeMode="None",
    )


def idle_evicting_user_totals_tws(
    events: DataFrame, idle_ms: int = 60_000
) -> DataFrame:
    """Per-user running (count, sum) with TIMER-BASED idle eviction — the
    tWS facility `applyInPandasWithState` only approximates with state
    timeouts: every input batch re-arms a per-key processing-time timer
    `idle_ms` ahead; if no input arrives before it fires,
    `handleExpiredTimer` emits a final tombstone row (`evicted=true`,
    the key's last totals) and CLEARS the state — bounded memory on an
    unbounded keyspace, with an auditable eviction record instead of
    silent state loss.

    Scale posture: state is (long, double) per LIVE key only — eviction
    makes the store's footprint track the active-key working set, not
    the all-time key cardinality; timers live in the state store next to
    the values, partitioned the same way.

    Requires the tWS runtime (`tws_available()`); `timeMode` must be
    `ProcessingTime` so `timerValues.getCurrentProcessingTimeInMs()` and
    timer expiry are defined."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.stateful_processor import (  # noqa: PLC0415
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class IdleEvictTotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._n = handle.getValueState("n", "n long")
            self._total = handle.getValueState("total", "total double")

        def handleInputRows(self, key, rows, timerValues):
            n = self._n.get()[0] if self._n.exists() else 0
            total = self._total.get()[0] if self._total.exists() else 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._n.update((n,))
            self._total.update((total,))
            # re-arm the idle timer: drop any previously registered timer
            # for this key, then schedule one idle_ms past now — the key
            # is evicted only if NO batch arrives in the window
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + idle_ms
            )
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "evicted": [False],
                }
            )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            n = self._n.get()[0] if self._n.exists() else 0
            total = self._total.get()[0] if self._total.exists() else 0.0
            self._n.clear()
            self._total.clear()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "evicted": [True],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        IdleEvictTotalsProcessor(),
        outputStructType=(
            "user_id long, n_events long, total_value double, evicted boolean"
        ),
        outputMode="Update",
        timeMode="ProcessingTime",
    )


# ---------------------------------------------------------------------------
# Default dispatch (r9 verdict task 7): transformWithStateInPandas is the
# CURRENT-generation stateful API and should be the path production code
# reaches first; applyInPandasWithState remains the tested fallback where
# the tWS state-server runtime (google.protobuf) is absent — as in this
# container (see the module docstring's environment gate).
# ---------------------------------------------------------------------------


def default_running_ewma(events: DataFrame, span: int = 16) -> DataFrame:
    """The repo's default per-user streaming EWMA: the tWS port when the
    runtime supports it, else the applyInPandasWithState original. Both
    share the bit-exact `tw_ewma_smoothed` batch oracle, so the dispatch
    can never change a result — only which engine facility computes it."""
    if tws_available():
        return running_ewma_tws(events, span)
    from ntd_gtfs_to_socrata_spark.streaming.stateful import running_ewma

    return running_ewma(events, span)


def default_running_user_totals(events: DataFrame) -> DataFrame:
    """The repo's default per-user running totals: tWS when available,
    else applyInPandasWithState (same arithmetic, same parity tests)."""
    if tws_available():
        return running_user_totals_tws(events)
    from ntd_gtfs_to_socrata_spark.streaming.stateful import running_user_totals

    return running_user_totals(events)
