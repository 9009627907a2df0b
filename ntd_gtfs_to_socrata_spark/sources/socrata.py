"""Socrata-style JSON source adapter (SURVEY.md §2.1 S1/S2, §4).

The reference GETs the full catalog and SoQL resources with requests
(/root/reference/publish_to_catalog.py:51-52, 524-528), pushing the consent
predicate server-side via ``$where``. This adapter keeps those semantics
behind an injectable transport:

- ``read_catalog``: full metadata scan → DataFrame with the catalog schema;
- ``read_resource``: SoQL resource scan; the ``where`` argument is
  serialized into ``$where`` — predicate pushdown to the server, the
  manual analog of a DataSource-V2 ``SupportsPushDownFilters``;
- paging via ``$limit``/``$offset`` so an arbitrarily large resource never
  materializes as one response (the 100 TB posture; a full custom
  DataSource V2 reader would map one partition per page range).

Transport is ``(url) -> (status, body_text)`` so tests inject fakes and
production injects a requests session (gated import — requests may be
absent in this environment).
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
    ) -> DataFrame:
        """S2 (publish_to_catalog.py:524-528): SoQL scan with server-side
        predicate pushdown and limit/offset paging."""
        pages: list[dict] = []
        offset = 0
        while True:
            url = f"{self.base_url}/resource/{fourfour}.json?$limit={self.page_size}&$offset={offset}"
            if where:
                url += f"&$where={quote(where)}"
            status, body = self.transport(url)
            if status != 200:
                raise RuntimeError(f"resource scan failed: HTTP {status}")
            batch = json.loads(body)
            pages.extend(batch)
            if len(batch) < self.page_size:
                break
            offset += self.page_size
        return spark.createDataFrame(pages, schema=schema)
