"""End-to-end CLI runs mirroring the reference's argv modes
(publish_to_catalog.py:584-611): catalog routing from JSON inputs and a
twice-run stops_map whose second run is a fixpoint (idempotent sync)."""

from __future__ import annotations

import io
import json
import zipfile

from ntd_gtfs_to_socrata_spark.__main__ import run_catalog, run_stops_map

STOPS_CSV = (
    "stop_id,stop_name,stop_lat,stop_lon,location_type\n"
    "1,Main,45.5,-122.6,0\n"
    "2,BadLat,xx,-122.6,\n"
    "3,Second,44.0,-121.0,1\n"
)


def test_cli_catalog_routes_and_logs(spark, tmp_path):
    feeds = [
        {"agency_name": "A", "feed_id": "F1", "fetch_link": "https://a.example.com/gtfs.zip",
         "agency_website": "https://a.example.com", "have_consent_for_ntm": True},
        {"agency_name": "B", "feed_id": "F2", "fetch_link": None,
         "agency_website": None, "have_consent_for_ntm": True},
        {"agency_name": "C", "feed_id": "F3", "fetch_link": "https://c.example.com/gtfs.zip",
         "agency_website": None, "have_consent_for_ntm": False},
    ]
    catalog = [
        {"id": "aaaa-0001", "name": "A - F1",
         "description": "x\nFeed ID: F1\ny", "tags": ["national transit map"]},
    ]
    fp, cp = tmp_path / "feeds.json", tmp_path / "catalog.json"
    fp.write_text(json.dumps(feeds))
    cp.write_text(json.dumps(catalog))
    out = str(tmp_path / "out")

    assert run_catalog(spark, str(fp), str(cp), out, public=True) == 0
    routed = {r["feed_id"]: r["action"] for r in spark.read.parquet(out + "/routed").collect()}
    # F1 matches the catalog entry -> update; F2 is new -> create; F3 has
    # no consent -> filtered out entirely
    assert routed == {"F1": "update", "F2": "create"}
    log = spark.read.parquet(out + "/run_log").collect()
    assert len(log) == 1 and log[0]["run_successful"]


def test_cli_stops_map_is_idempotent(spark, tmp_path):
    zips = tmp_path / "zips"
    zips.mkdir()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("stops.txt", STOPS_CSV)
    (zips / "feedX.zip").write_bytes(buf.getvalue())

    state, out = str(tmp_path / "state"), str(tmp_path / "out")
    assert run_stops_map(spark, str(zips), state, out) == 0
    first = {r["feed_id_stop_id"] for r in spark.read.parquet(state + "/stops_state").collect()}
    assert first == {"feedX_1", "feedX_3"}  # row 2 quarantined (bad lat)
    q = spark.read.parquet(out + "/quarantine").collect()
    assert {r["stop_id"] for r in q} == {"2"}

    # second run over the same input converges to the same state
    assert run_stops_map(spark, str(zips), state, out) == 0
    second = {r["feed_id_stop_id"] for r in spark.read.parquet(state + "/stops_state").collect()}
    assert second == first
    # run_log appends one row per run
    assert spark.read.parquet(out + "/run_log").count() == 2
