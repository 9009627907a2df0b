"""Sink adapters (SURVEY.md §2.1 S7-S11).

The reference POSTs CSV/JSON bodies to Socrata serially with a utf-8
encode-retry (/root/reference/publish_to_catalog.py:345-352) and a 4-step
dataset-revision protocol (L416-497). Here sinks are pluggable behind a
small protocol:

- ``LocalParquetSink`` / ``LocalCsvSink`` — file-based targets for tests
  and for lakehouse-style local output (S10 append semantics included);
- ``HttpBatchSink`` — ``foreachPartition``-batched POST with encode-retry,
  transport injected (tests pass a recorder; production passes a requests
  session). Executor-side, so N partitions POST in parallel instead of the
  reference's single thread;
- ``RevisionPublisher`` — the 4-step create/replace protocol as a
  driver-side adapter over a SMALL routed DataFrame (one row per dataset
  to publish; data-plane rows never pass through the driver).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field
from typing import Any, Protocol

from pyspark.sql import DataFrame, Row


class Sink(Protocol):
    def write(self, df: DataFrame) -> dict[str, Any]: ...


@dataclass
class LocalParquetSink:
    """File-based sink; ``mode='append'`` gives the S10 run-log append."""

    path: str
    mode: str = "overwrite"
    partition_by: tuple[str, ...] = ()

    def write(self, df: DataFrame) -> dict[str, Any]:
        writer = df.write.mode(self.mode)
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(self.path)
        return {"path": self.path, "mode": self.mode}


@dataclass
class LocalCsvSink:
    """CSV sink with header (quarantine files keep their header —
    publish_to_catalog.py:335-336)."""

    path: str
    mode: str = "overwrite"

    def write(self, df: DataFrame) -> dict[str, Any]:
        df.write.mode(self.mode).option("header", True).csv(self.path)
        return {"path": self.path, "mode": self.mode}


Transport = Callable[[str, bytes, dict[str, str]], tuple[int, str]]
"""(url, body, headers) -> (status_code, response_text)."""


def _post_rows(
    rows: Iterator[Row],
    url: str,
    transport: Transport,
    batch_size: int,
    content_type: str,
) -> Iterator[tuple[int, int]]:
    """Executor-side batched POST. Mirrors the reference's encode-retry
    (publish_to_catalog.py:347-350): send str body, on failure re-send
    explicitly utf-8 encoded."""
    batch: list[dict[str, Any]] = []

    def flush() -> Iterator[tuple[int, int]]:
        if not batch:
            return
        body = json.dumps(batch, ensure_ascii=False, default=str)
        headers = {"Content-Type": content_type}
        try:
            status, _ = transport(url, body.encode("ascii", errors="strict"), headers)
        except (UnicodeEncodeError, UnicodeDecodeError):
            status, _ = transport(url, body.encode("utf-8"), headers)
        yield (status, len(batch))
        batch.clear()

    for row in rows:
        batch.append(row.asDict(recursive=True))
        if len(batch) >= batch_size:
            yield from flush()
    yield from flush()


@dataclass
class HttpBatchSink:
    """S7/S8: row-level upsert/delete POSTs, batched per partition on the
    executors. The delete-marker convention (S8) is data: callers add
    ``{':deleted': True}`` rows (publish_to_catalog.py:290-298) before
    writing."""

    url: str
    transport: Transport
    batch_size: int = 10_000
    content_type: str = "application/json"

    def write(self, df: DataFrame) -> dict[str, Any]:
        url, transport = self.url, self.transport
        batch_size, content_type = self.batch_size, self.content_type

        def handle(rows: Iterator[Row]) -> Iterator[tuple[int, int]]:
            yield from _post_rows(rows, url, transport, batch_size, content_type)

        results = df.rdd.mapPartitions(handle).collect()
        ok = sum(n for status, n in results if 200 <= status < 300)
        failed = sum(n for status, n in results if not 200 <= status < 300)
        return {"rows_accepted": ok, "rows_failed": failed, "batches": len(results)}


@dataclass
class RevisionPublisher:
    """S9: the 4-step Socrata revision protocol
    (publish_to_catalog.py:416-497) — create revision, create source,
    upload bytes, apply — per routed catalog row. Control-plane only: the
    routed DataFrame is one row per dataset (small); payload bytes come
    from the payload column (S12 fallback handled upstream via coalesce).
    """

    transport: Transport
    base_url: str = "https://example.invalid/api"
    calls: list[dict[str, Any]] = field(default_factory=list)

    def publish(self, routed: DataFrame, payload_col: str = "payload") -> dict[str, int]:
        created = updated = errors = 0
        for row in routed.toLocalIterator():  # small control-plane frame
            d = row.asDict()
            try:
                steps = [
                    ("create_revision", f"{self.base_url}/revisions"),
                    ("create_source", f"{self.base_url}/sources"),
                    ("upload_bytes", f"{self.base_url}/upload"),
                    ("apply_revision", f"{self.base_url}/apply"),
                ]
                for step, url in steps:
                    payload = d.get(payload_col) if step == "upload_bytes" else json.dumps(
                        {k: v for k, v in d.items() if k != payload_col}, default=str
                    ).encode()
                    status, _ = self.transport(url, payload or b"", {"X-Step": step})
                    if not 200 <= status < 300:
                        raise RuntimeError(f"{step} failed: {status}")
                    self.calls.append({"step": step, "action": d.get("action")})
                if d.get("action") == "create":
                    created += 1
                else:
                    updated += 1
            except RuntimeError:
                errors += 1
        return {"created": created, "updated": updated, "errors": errors}
