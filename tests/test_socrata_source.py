"""Socrata source adapter: pushdown reaches the URL, paging walks offsets,
errors surface (SURVEY.md §2.1 S1/S2)."""

from __future__ import annotations

import json

import pytest

from ntd_gtfs_to_socrata_spark.sources.socrata import SocrataSource


def test_catalog_scan(spark):
    def transport(url):
        assert url.endswith("/api/views/metadata/v1.json")
        return 200, json.dumps(
            [
                {"id": "ab12-cd34", "name": "n1", "description": "d", "tags": ["national transit map"]},
                {"id": "ef56-gh78", "name": "n2", "description": None, "tags": None},
            ]
        )

    src = SocrataSource(base_url="https://x.invalid", transport=transport)
    rows = src.read_catalog(spark).collect()
    assert {r["id"] for r in rows} == {"ab12-cd34", "ef56-gh78"}
    assert rows[0]["tags"] == ["national transit map"]


def test_resource_scan_pushdown_and_paging(spark):
    urls = []

    def transport(url):
        urls.append(url)
        offset = int(url.split("$offset=")[1].split("&")[0])
        if offset == 0:
            batch = [{"feed_id": str(i), "have_consent_for_ntm": True} for i in range(2)]
        elif offset == 2:
            batch = [{"feed_id": "2", "have_consent_for_ntm": True}]
        else:
            batch = []
        return 200, json.dumps(batch)

    src = SocrataSource(base_url="https://x.invalid", transport=transport, page_size=2)
    df = src.read_resource(spark, "x87r-3ckx", where="have_consent_for_ntm=true")
    assert df.count() == 3
    # the predicate was pushed into every page request
    assert all("%24where=" in u or "$where=" in u for u in urls)
    assert len(urls) == 2  # short page terminates the walk


def test_resource_scan_error(spark):
    src = SocrataSource(base_url="https://x.invalid", transport=lambda u: (503, ""))
    with pytest.raises(RuntimeError, match="HTTP 503"):
        src.read_resource(spark, "bad1-bad2")
