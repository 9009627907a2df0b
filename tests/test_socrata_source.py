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


def _paged_transport(log_path):
    """Fake Socrata server: count probe + 3 rows in pages of 2. Logs every
    URL (with the pid that fetched it) to ``log_path`` — the transport runs
    inside executor tasks, so an in-memory list would not observe them."""

    def transport(url):
        import os

        with open(log_path, "a") as f:
            f.write(f"{os.getpid()}\t{url}\n")
        if "$select=" in url or "%24select=" in url:
            return 200, json.dumps([{"n": "3"}])
        offset = int(url.split("offset=")[1].split("&")[0])
        rows = [
            {"feed_id": str(i), "have_consent_for_ntm": True}
            for i in range(offset, min(offset + 2, 3))
        ]
        return 200, json.dumps(rows)

    return transport


def test_resource_scan_pushdown_and_paging(spark, tmp_path):
    log = tmp_path / "urls.log"
    src = SocrataSource(
        base_url="https://x.invalid", transport=_paged_transport(str(log)), page_size=2
    )
    df = src.read_resource(spark, "x87r-3ckx", where="have_consent_for_ntm=true")
    rows = df.collect()
    assert len(rows) == 3
    assert {r["feed_id"] for r in rows} == {"0", "1", "2"}
    urls = [line.split("\t")[1] for line in log.read_text().splitlines()]
    # the predicate was pushed into the count probe AND every page request
    assert all("%24where=" in u or "$where=" in u for u in urls)
    page_urls = [u for u in urls if "offset=" in u]
    assert len(page_urls) == 2  # ceil(3/2) pages, sized by the count probe


def test_resource_pages_fetched_in_tasks_not_driver(spark, tmp_path):
    """The scan plan carries one input partition per page and the page GETs
    execute inside tasks: no URL is hit until an action runs, and the page
    fetches happen in worker processes, not the driver."""
    import os

    log = tmp_path / "urls.log"
    src = SocrataSource(
        base_url="https://x.invalid", transport=_paged_transport(str(log)), page_size=2
    )
    df = src.read_resource(spark, "x87r-3ckx")
    # lazy: only the driver-side count probe has run so far
    probe_lines = log.read_text().splitlines()
    assert len(probe_lines) == 1 and "select=" in probe_lines[0].lower()
    assert df.rdd.getNumPartitions() == 2  # one partition per page
    assert df.count() == 3
    page_pids = {
        int(line.split("\t")[0])
        for line in log.read_text().splitlines()
        if "offset=" in line
    }
    assert page_pids and os.getpid() not in page_pids  # fetched off-driver


def test_resource_scan_error(spark):
    src = SocrataSource(base_url="https://x.invalid", transport=lambda u: (503, ""))
    with pytest.raises(RuntimeError, match="HTTP 503"):
        src.read_resource(spark, "bad1-bad2")
