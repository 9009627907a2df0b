"""Socrata-style JSON source adapter (SURVEY.md §2.1 S1/S2, §4).

The reference GETs the full catalog and SoQL resources with requests
(/root/reference/publish_to_catalog.py:51-52, 524-528), pushing the consent
predicate server-side via ``$where``. This adapter keeps those semantics
behind an injectable transport:

- ``read_catalog``: full metadata scan → DataFrame with the catalog schema;
- ``read_resource``: SoQL resource scan; the ``where`` argument is
  serialized into ``$where`` — predicate pushdown to the server, the
  manual analog of a DataSource-V2 ``SupportsPushDownFilters``;
- **executor-side paging**: one tiny ``$select=count(1)`` probe on the
  driver sizes the scan, then a page-range DataFrame is mapped through
  ``mapInPandas`` so every ``$limit``/``$offset`` page is fetched and
  parsed *inside a task*. No page body ever lands on the driver — the
  100 TB posture SURVEY §2.1 S1 specifies (one partition per page range,
  exactly what a custom DataSource V2 ``planInputPartitions`` would do).

Transport is ``(url) -> (status, body_text)`` so tests inject fakes and
production injects a requests session (gated import — requests may be
absent in this environment). The transport is serialized to executors via
cloudpickle, so it must be picklable (plain functions and closures are).
"""

from __future__ import annotations

import json
from collections.abc import Callable
from dataclasses import dataclass
from urllib.parse import quote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

GetTransport = Callable[[str], tuple[int, str]]

CATALOG_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
    ]
)

AGENCY_FEED_SCHEMA = T.StructType(
    [
        T.StructField("feed_id", T.StringType()),
        T.StructField("agency_name", T.StringType()),
        T.StructField("ntd_id", T.StringType()),
        T.StructField("ntd_name", T.StringType()),
        T.StructField("fetch_link", T.StringType()),
        T.StructField("has_gtfs", T.StringType()),
        T.StructField("agency_website", T.StringType()),
        T.StructField("uza", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("have_consent_for_ntm", T.BooleanType()),
    ]
)


def default_transport(url: str) -> tuple[int, str]:
    try:
        import requests  # noqa: PLC0415 — optional dependency
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("no transport injected and requests unavailable") from e
    resp = requests.get(url, timeout=600)  # reference's ceiling, L27
    return resp.status_code, resp.text


@dataclass
class SocrataSource:
    base_url: str
    transport: GetTransport = default_transport
    page_size: int = 50_000

    def read_catalog(self, spark: SparkSession) -> DataFrame:
        """S1 (publish_to_catalog.py:51-52): full catalog metadata scan."""
        status, body = self.transport(f"{self.base_url}/api/views/metadata/v1.json")
        if status != 200:
            raise RuntimeError(f"catalog scan failed: HTTP {status}")
        rows = json.loads(body)
        return spark.createDataFrame(rows, schema=CATALOG_SCHEMA)

    def read_resource(
        self,
        spark: SparkSession,
        fourfour: str,
        where: str | None = None,
        schema: T.StructType = AGENCY_FEED_SCHEMA,
        order: str | None = ":id",
    ) -> DataFrame:
        """S2 (publish_to_catalog.py:524-528): SoQL scan with server-side
        predicate pushdown and limit/offset paging — pages fetched in tasks.

        Protocol: (1) driver issues one ``$select=count(1)`` probe (a
        one-row response) to size the scan; (2) ``spark.range(n_pages)``
        with one partition per page becomes the input-partition plan;
        (3) ``mapInPandas`` fetches+parses each page inside its task, so
        row data flows executor→downstream without ever accumulating in a
        driver-side list. ``order`` (default Socrata's ``:id`` row id)
        makes offset paging deterministic across tasks — without a total
        order, concurrent offset windows may overlap/miss rows.

        STATIC-SNAPSHOT ASSUMPTION: the page plan is sized once by the
        count probe; if the server-side resource grows or shrinks between
        the probe and the task-side fetches, offset windows shift under
        us. Each task therefore verifies its page's row count against the
        probe total (every page must be full except the last, which must
        hold exactly the remainder) and raises on mismatch rather than
        silently missing/duplicating rows. Re-run the scan on failure —
        the reference has the same read-then-act race, just undetected
        (publish_to_catalog.py:524-530).
        """
        base = f"{self.base_url}/resource/{fourfour}.json"
        probe = f"{base}?$select={quote('count(1) AS n')}"
        if where:
            probe += f"&$where={quote(where)}"
        status, body = self.transport(probe)
        if status != 200:
            raise RuntimeError(f"resource scan failed: HTTP {status}")
        total = int(json.loads(body)[0]["n"])
        page_size = self.page_size
        n_pages = -(-total // page_size) if total else 0
        if n_pages == 0:
            return spark.createDataFrame([], schema=schema)

        transport = self.transport
        cols = [f.name for f in schema.fields]

        def fetch_pages(batches):
            import pandas as pd  # noqa: PLC0415 — executor-side import

            for pdf in batches:
                for page in pdf["id"].tolist():
                    url = f"{base}?$limit={page_size}&$offset={page * page_size}"
                    if order:
                        url += f"&$order={quote(order)}"
                    if where:
                        url += f"&$where={quote(where)}"
                    st, bd = transport(url)
                    if st != 200:
                        raise RuntimeError(f"resource scan failed: HTTP {st}")
                    batch = json.loads(bd)
                    expected = (
                        page_size
                        if page < n_pages - 1
                        else total - (n_pages - 1) * page_size
                    )
                    if len(batch) != expected:
                        raise RuntimeError(
                            f"resource changed during scan: page {page} returned "
                            f"{len(batch)} rows, expected {expected} (probe total "
                            f"{total}); re-run the scan"
                        )
                    out = pd.DataFrame.from_records(batch, columns=cols)
                    # absent keys -> NaN; normalize to None so Arrow maps
                    # them to SQL NULL for string/boolean fields alike
                    yield out.astype(object).where(pd.notna(out), None)

        pages = spark.range(0, n_pages, numPartitions=n_pages)
        return pages.mapInPandas(fetch_pages, schema=schema)
