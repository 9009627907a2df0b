"""Socrata as a planner-visible Spark 4 Python DataSource (SURVEY.md §4).

The reference pushes its consent predicate server-side by hand-writing a
SoQL ``$where`` (/root/reference/publish_to_catalog.py:525). The
``SocrataSource`` adapter (socrata.py) reproduces that with an explicit
``where=`` argument; THIS module closes the ergonomics gap: a registered
``spark.read.format("socrata")`` source whose ``pushFilters`` compiles
Catalyst predicates to SoQL, so

    spark.read.format("socrata").options(...).load()
         .filter(F.col("have_consent_for_ntm") == True)

ships the filter to the server and the Spark plan carries NO residual
Filter node — the DataSource-V2 ``SupportsPushDownFilters`` behavior,
via the Python DataSource API (pyspark.sql.datasource, Spark 4.1).

Execution model mirrors socrata.py: a driver-side ``$select=count(1)``
probe sizes the scan (with the pushed ``$where`` applied, so the page
plan covers exactly the filtered rows), then ``partitions()`` returns one
``InputPartition`` per page and ``read()`` fetches+parses its page inside
the task — rows never accumulate on the driver. The same static-snapshot
page-count verification as ``SocrataSource.read_resource`` applies.

Supported pushdown surface (everything else is returned to Spark and
re-applied post-scan, so correctness never depends on the translation):

- ``EqualTo(col, str|bool|int|float)``     → ``col = literal``
- ``IsNull(col)`` / ``IsNotNull(col)``     → ``col IS [NOT] NULL``
- ``GreaterThan[OrEqual]`` / ``LessThan[OrEqual]`` on numeric/str
- ``StringStartsWith(col, prefix)``        → ``starts_with(col, 'p')``
  (the reference's own prefix scan, publish_to_catalog.py:263)

Transport: options are strings, so a live source uses HTTP (requests); for
hermetic tests the ``fake_rows`` option embeds a JSON row list and the
source evaluates its own compiled ``$where`` against it — the "server" and
its filter evaluation travel with the (picklable) reader into the task,
proving rows are filtered BEFORE Spark sees them.

Register per-session with ``register_socrata_datasource(spark)``; requires
``spark.sql.python.filterPushdown.enabled=true`` (set by the helper).
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence
from dataclasses import dataclass
from typing import Any
from urllib.parse import quote

from pyspark.sql import Row, SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    StringStartsWith,
    WriterCommitMessage,
)

from ntd_gtfs_to_socrata_spark.sources.socrata import (
    AGENCY_FEED_SCHEMA,
    default_transport,
)


def default_post_transport(url: str, body: bytes, headers: dict) -> tuple[int, str]:
    try:
        import requests  # noqa: PLC0415 — optional dependency
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("no transport available and requests missing") from e
    resp = requests.post(url, data=body, headers=headers, timeout=600)
    return resp.status_code, resp.text


def _soql_literal(value: Any) -> str | None:
    """Render a Python literal as SoQL; None = not renderable (don't push)."""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (int, float)):
        return repr(value)
    if isinstance(value, str):
        return "'" + value.replace("'", "''") + "'"
    return None


def _compile_filter(f: Filter) -> str | None:
    """One Catalyst filter → one SoQL clause; None = unsupported."""
    attr = getattr(f, "attribute", None)
    if not isinstance(attr, tuple) or len(attr) != 1:
        return None  # nested columns don't exist in a flat Socrata resource
    col = attr[0]
    if isinstance(f, IsNull):
        return f"{col} IS NULL"
    if isinstance(f, IsNotNull):
        return f"{col} IS NOT NULL"
    if isinstance(f, StringStartsWith):
        lit = _soql_literal(f.value)
        return f"starts_with({col}, {lit})" if lit else None
    ops = {
        EqualTo: "=",
        GreaterThan: ">",
        GreaterThanOrEqual: ">=",
        LessThan: "<",
        LessThanOrEqual: "<=",
    }
    op = ops.get(type(f))
    if op is None:
        return None
    lit = _soql_literal(f.value)
    return f"{col} {op} {lit}" if lit is not None else None


def _eval_clause_on_row(f: Filter, row: dict[str, Any]) -> bool:
    """The fake server's evaluation of one pushed filter — mirrors what
    Socrata would do with the compiled clause. SQL semantics: comparisons
    against NULL are false."""
    col = f.attribute[0]
    v = row.get(col)
    if isinstance(f, IsNull):
        return v is None
    if isinstance(f, IsNotNull):
        return v is not None
    if v is None:
        return False
    if isinstance(f, StringStartsWith):
        return isinstance(v, str) and v.startswith(f.value)
    if isinstance(f, EqualTo):
        return v == f.value
    if isinstance(f, GreaterThan):
        return v > f.value
    if isinstance(f, GreaterThanOrEqual):
        return v >= f.value
    if isinstance(f, LessThan):
        return v < f.value
    if isinstance(f, LessThanOrEqual):
        return v <= f.value
    return False  # pragma: no cover — unsupported types never get here


@dataclass
class _PagePartition(InputPartition):
    page: int


class SocrataScanReader(DataSourceReader):
    """Reader with SoQL filter pushdown and one-page-per-partition planning."""

    def __init__(self, options: dict[str, str], schema: T.StructType) -> None:
        self.base_url = options.get("base_url", "").rstrip("/")
        self.fourfour = options.get("fourfour", "")
        self.page_size = int(options.get("page_size", "50000"))
        self.order = options.get("order", ":id")
        self.schema = schema
        self.pushed: list[Filter] = []
        fake = options.get("fake_rows")
        self.fake_rows: list[dict[str, Any]] | None = (
            json.loads(fake) if fake is not None else None
        )
        if not self.fake_rows and not self.base_url:
            raise ValueError("socrata source needs base_url (or fake_rows for tests)")
        self.total: int | None = None
        self.n_pages: int | None = None

    # -- pushdown ----------------------------------------------------------
    def pushFilters(self, filters: list[Filter]) -> list[Filter]:
        """Keep every filter we can compile to SoQL; return the rest to
        Spark for post-scan evaluation. Called once during planning, before
        partitions(); eager (not a generator) so ``self.pushed`` is fully
        populated regardless of when the caller consumes the result."""
        unsupported: list[Filter] = []
        for f in filters:
            if _compile_filter(f) is not None:
                self.pushed.append(f)
            else:
                unsupported.append(f)
        return unsupported

    def _where(self) -> str | None:
        clauses = [_compile_filter(f) for f in self.pushed]
        return " AND ".join(c for c in clauses if c) or None

    # -- the fake server (hermetic tests) ----------------------------------
    def _server_rows(self) -> list[dict[str, Any]]:
        """Filtered row list as the Socrata server would return it — pushed
        clauses applied server-side, i.e. before any Spark operator runs."""
        assert self.fake_rows is not None
        return [
            r
            for r in self.fake_rows
            if all(_eval_clause_on_row(f, r) for f in self.pushed)
        ]

    # -- planning ----------------------------------------------------------
    def _probe_total(self) -> int:
        if self.fake_rows is not None:
            return len(self._server_rows())
        base = f"{self.base_url}/resource/{self.fourfour}.json"
        url = f"{base}?$select={quote('count(1) AS n')}"
        where = self._where()
        if where:
            url += f"&$where={quote(where)}"
        status, body = default_transport(url)
        if status != 200:
            raise RuntimeError(f"socrata count probe failed: HTTP {status}")
        return int(json.loads(body)[0]["n"])

    def partitions(self) -> Sequence[InputPartition]:
        self.total = self._probe_total()
        self.n_pages = -(-self.total // self.page_size) if self.total else 0
        return [_PagePartition(i) for i in range(max(self.n_pages, 1))]

    # -- execution (inside the task) ---------------------------------------
    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        if self.total == 0:
            return
        page = partition.page
        if self.fake_rows is not None:
            rows = self._server_rows()[
                page * self.page_size : (page + 1) * self.page_size
            ]
        else:
            base = f"{self.base_url}/resource/{self.fourfour}.json"
            url = f"{base}?$limit={self.page_size}&$offset={page * self.page_size}"
            if self.order:
                url += f"&$order={quote(self.order)}"
            where = self._where()
            if where:
                url += f"&$where={quote(where)}"
            status, body = default_transport(url)
            if status != 200:
                raise RuntimeError(f"socrata page fetch failed: HTTP {status}")
            rows = json.loads(body)
            expected = (
                self.page_size
                if page < (self.n_pages or 1) - 1
                else (self.total or 0) - ((self.n_pages or 1) - 1) * self.page_size
            )
            if len(rows) != expected:
                raise RuntimeError(
                    f"resource changed during scan: page {page} returned "
                    f"{len(rows)} rows, expected {expected}; re-run the scan"
                )
        names = [f.name for f in self.schema.fields]
        for r in rows:
            yield tuple(r.get(n) for n in names)


@dataclass
class _UpsertCommit(WriterCommitMessage):
    n_rows: int
    n_batches: int


class SocrataUpsertWriter(DataSourceWriter):
    """S7 as a native writer: ``df.write.format("socrata").mode("append")``
    runs the reference's batched row-upsert POST (publish_to_catalog.py:
    345-352, including the ascii→utf-8 encode-retry) once per partition on
    the executors; the driver sees only per-task commit messages.

    ``mode("append")`` IS upsert — Socrata merges by row identifier, so
    append is idempotent-by-key (the J4 semantics live server-side).
    ``mode("overwrite")`` is rejected: snapshot-replace needs the deletion
    anti-join against existing keys (J5, ``operators/merge.full_sync``) —
    a plan, not a blind write.

    Hermetic test mode: the ``log_path`` option redirects every POST to an
    append-only local log (url + row count per batch), the same
    observe-from-the-task pattern as the reader's fake server."""

    def __init__(self, options: dict[str, str], schema: T.StructType) -> None:
        self.base_url = options.get("base_url", "").rstrip("/")
        self.fourfour = options.get("fourfour", "")
        self.batch_size = int(options.get("batch_size", "10000"))
        self.log_path = options.get("log_path")
        if not self.log_path and not self.base_url:
            raise ValueError("socrata writer needs base_url (or log_path for tests)")

    def _transport(self, url: str, body: bytes, headers: dict) -> tuple[int, str]:
        if self.log_path:
            entry = {"url": url, "n": len(json.loads(body.decode("utf-8")))}
            with open(self.log_path, "a") as f:
                f.write(json.dumps(entry) + "\n")
            return 200, "{}"
        return default_post_transport(url, body, headers)

    def write(self, iterator: Iterator[Row]) -> _UpsertCommit:
        from ntd_gtfs_to_socrata_spark.sinks import _post_rows

        url = f"{self.base_url}/resource/{self.fourfour}.json"
        results = list(
            _post_rows(iterator, url, self._transport, self.batch_size, "application/json")
        )
        failed = [(s, n) for s, n in results if not 200 <= s < 300]
        if failed:
            raise RuntimeError(f"upsert POST failed for batches: {failed}")
        return _UpsertCommit(
            n_rows=sum(n for _, n in results), n_batches=len(results)
        )

    def commit(self, messages: list[_UpsertCommit]) -> None:
        # row upserts are applied per-POST and idempotent by key; there is
        # no finalize step. Record the run total in test mode.
        if self.log_path:
            total = sum(m.n_rows for m in messages if m)
            with open(self.log_path, "a") as f:
                f.write(json.dumps({"commit": total}) + "\n")

    def abort(self, messages: list[_UpsertCommit]) -> None:
        # nothing to roll back: Socrata upserts have no transaction; a
        # retried job re-POSTs the same keyed rows (idempotent)
        pass


class SocrataStreamWriter(DataSourceStreamWriter):
    """Streaming upsert sink: ``df.writeStream.format("socrata")`` POSTs
    each microbatch's rows with the same batched, encode-retrying protocol
    as the batch writer — per-partition on the executors, commit messages
    only to the driver. Because Socrata upserts are idempotent BY KEY, a
    replayed microbatch (failure before checkpoint commit) re-POSTs the
    same keyed rows and converges — the effectively-once contract the
    ``foreachBatch`` merge (streaming/stateful.py) documents, packaged as
    a native sink.

    ``commit(batchId)`` records the batch id in test mode so the
    checkpoint-replay test can prove batch-boundary tracking."""

    def __init__(self, options: dict[str, str], schema: T.StructType) -> None:
        self.base_url = options.get("base_url", "").rstrip("/")
        self.fourfour = options.get("fourfour", "")
        self.batch_size = int(options.get("batch_size", "10000"))
        self.log_path = options.get("log_path")
        if not self.log_path and not self.base_url:
            raise ValueError("socrata stream writer needs base_url (or log_path)")

    def _transport(self, url: str, body: bytes, headers: dict) -> tuple[int, str]:
        if self.log_path:
            entry = {"url": url, "n": len(json.loads(body.decode("utf-8")))}
            with open(self.log_path, "a") as f:
                f.write(json.dumps(entry) + "\n")
            return 200, "{}"
        return default_post_transport(url, body, headers)

    def write(self, iterator: Iterator[Row]) -> _UpsertCommit:
        from ntd_gtfs_to_socrata_spark.sinks import _post_rows

        url = f"{self.base_url}/resource/{self.fourfour}.json"
        results = list(
            _post_rows(iterator, url, self._transport, self.batch_size, "application/json")
        )
        failed = [(s, n) for s, n in results if not 200 <= s < 300]
        if failed:
            raise RuntimeError(f"stream upsert POST failed for batches: {failed}")
        return _UpsertCommit(n_rows=sum(n for _, n in results), n_batches=len(results))

    def commit(self, messages: list[_UpsertCommit], batchId: int) -> None:  # noqa: N803
        if self.log_path:
            total = sum(m.n_rows for m in messages if m)
            with open(self.log_path, "a") as f:
                f.write(json.dumps({"commit": total, "batch_id": batchId}) + "\n")

    def abort(self, messages: list[_UpsertCommit], batchId: int) -> None:  # noqa: N803
        # no transaction to roll back; a retried microbatch re-POSTs the
        # same keyed rows (idempotent by row identifier)
        pass


class SocrataStreamReader(SimpleDataSourceStreamReader):
    """Incremental microbatch reads of a Socrata resource: the offset is a
    row cursor over the ``:id``-ordered resource, so each batch fetches
    only rows the last committed offset hasn't covered — the streaming
    twin of the reference's rerun-the-whole-resource batch scan
    (publish_to_catalog.py:524-530), with Structured Streaming's
    checkpointed exactly-once offset tracking replacing "hope the cron
    didn't overlap".

    At most ``page_size`` rows per microbatch (source-side rate limit);
    ``readBetweenOffsets`` replays any [start, end) range deterministically
    for failure recovery — both map directly onto SoQL
    ``$order=:id&$offset&$limit`` windows. Appends-only by assumption
    (Socrata row ids are monotone); updates to old rows belong to the
    batch full-sync path, not the tail-follow."""

    def __init__(self, options: dict[str, str], schema: T.StructType) -> None:
        self.base_url = options.get("base_url", "").rstrip("/")
        self.fourfour = options.get("fourfour", "")
        self.page_size = int(options.get("page_size", "50000"))
        self.schema = schema
        fake = options.get("fake_rows")
        self.fake_rows: list[dict[str, Any]] | None = (
            json.loads(fake) if fake is not None else None
        )
        if self.fake_rows is None and not self.base_url:
            raise ValueError("socrata stream needs base_url (or fake_rows for tests)")

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def _fetch(self, start: int, limit: int) -> list[dict[str, Any]]:
        if self.fake_rows is not None:
            return self.fake_rows[start : start + limit]
        base = f"{self.base_url}/resource/{self.fourfour}.json"
        url = f"{base}?$order={quote(':id')}&$offset={start}&$limit={limit}"
        status, body = default_transport(url)
        if status != 200:
            raise RuntimeError(f"socrata stream fetch failed: HTTP {status}")
        return json.loads(body)

    def _as_tuples(self, rows: list[dict[str, Any]]) -> list[tuple]:
        # a LIST, not a generator: the runner caches the prefetched batch
        # and copies it for replay, so the return must be picklable
        names = [f.name for f in self.schema.fields]
        return [tuple(r.get(n) for n in names) for r in rows]

    def read(self, start: dict) -> tuple[list[tuple], dict]:
        rows = self._fetch(start["offset"], self.page_size)
        return self._as_tuples(rows), {"offset": start["offset"] + len(rows)}

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        n = end["offset"] - start["offset"]
        return self._as_tuples(self._fetch(start["offset"], n) if n > 0 else [])

    def commit(self, end: dict) -> None:
        # offsets are plain row cursors; nothing to clean up source-side
        pass


class SocrataDataSource(DataSource):
    """``spark.read.format("socrata")`` / ``df.write.format("socrata")`` /
    ``spark.readStream.format("socrata")`` — options: base_url, fourfour,
    page_size, order, batch_size, fake_rows / log_path (tests)."""

    @classmethod
    def name(cls) -> str:
        return "socrata"

    def schema(self) -> T.StructType:
        return AGENCY_FEED_SCHEMA

    def reader(self, schema: T.StructType) -> SocrataScanReader:
        return SocrataScanReader(dict(self.options), schema)

    def writer(self, schema: T.StructType, overwrite: bool) -> SocrataUpsertWriter:
        if overwrite:
            raise ValueError(
                "mode('overwrite') would need the deletion anti-join against "
                "existing keys — use operators.merge.full_sync (J5) and "
                "write the result with mode('append')"
            )
        return SocrataUpsertWriter(dict(self.options), schema)

    def simpleStreamReader(self, schema: T.StructType) -> SocrataStreamReader:
        return SocrataStreamReader(dict(self.options), schema)

    def streamWriter(self, schema: T.StructType, overwrite: bool) -> SocrataStreamWriter:
        if overwrite:
            raise ValueError(
                "streaming overwrite is not a Socrata operation — stream "
                "upserts with the default append mode"
            )
        return SocrataStreamWriter(dict(self.options), schema)


def register_socrata_datasource(spark: SparkSession) -> None:
    """Register the source and enable the Python-source pushdown conf
    (planning-time SQL conf; runtime-settable)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SocrataDataSource)
