"""CLI mirroring the reference's argv dispatch (`Main`,
/root/reference/publish_to_catalog.py:584-611; README.md:14-21): three run
modes, file-based sources/sinks so the pipelines run end-to-end locally
(the HTTP Socrata adapters plug in behind the same functions — see
sources/socrata.py and sinks.RevisionPublisher).

    python -m ntd_gtfs_to_socrata_spark catalog      --feeds F.json --catalog C.json --out DIR
    python -m ntd_gtfs_to_socrata_spark catalog_test --feeds F.json --catalog C.json --out DIR
    python -m ntd_gtfs_to_socrata_spark stops_map    --zips 'DIR/*.zip' --state DIR --out DIR

`catalog_test` = `catalog` against the same inputs but marked private
(the reference's test mode, publish_to_catalog.py:520, 592-593). Every
mode appends a run-summary row under <out>/run_log (entry point 3,
L605-608).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import uuid

from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.plans.catalog_sync import route_catalog
from ntd_gtfs_to_socrata_spark.plans.run_log import run_summary
from ntd_gtfs_to_socrata_spark.plans.stops_sync import sync_stops
from ntd_gtfs_to_socrata_spark.session import get_spark
from ntd_gtfs_to_socrata_spark.sinks import LocalParquetSink
from ntd_gtfs_to_socrata_spark.sources.zip_ingest import read_stops_from_zips


def _write(df, path: str, mode: str = "overwrite") -> None:
    LocalParquetSink(path=path, mode=mode).write(df)


def run_catalog(spark, feeds_path: str, catalog_path: str, out: str, public: bool) -> int:
    feeds = spark.read.option("multiLine", True).json(feeds_path)
    catalog = spark.read.option("multiLine", True).json(catalog_path)
    routed = route_catalog(feeds, catalog).withColumn("make_public", F.lit(public))
    _write(routed, os.path.join(out, "routed"))
    log = routed.select(
        F.col("feed_id"),
        F.col("agency_name"),
        F.col("action"),
        F.coalesce(F.col("existing_id"), F.lit("")).alias("message"),
    )
    _write(run_summary(log, run_successful=True), os.path.join(out, "run_log"), "append")
    n = routed.count()
    print(f"catalog: routed {n} feeds -> {out}/routed")
    return 0


def run_stops_map(spark, zips_glob: str, state_dir: str, out: str) -> int:
    # feed identity = archive basename (the reference keys feeds by the
    # FeedID that selected each zip; file-based runs use the filename)
    stops_raw = read_stops_from_zips(spark, zips_glob).withColumn(
        "feed_id", F.regexp_extract(F.col("path"), r"([^/]+)\.zip$", 1)
    )
    state_path = os.path.join(state_dir, "stops_state")
    if os.path.isdir(state_path):
        existing = spark.read.parquet(state_path)
    else:
        existing = spark.createDataFrame(
            [], "feed_id_stop_id string, stop_name string, location string"
        )
    res = sync_stops(stops_raw, existing)
    # two-phase swap via a run-unique staging dir: materialize the new
    # snapshot before overwriting the state it was derived from (the
    # lakehouse target would MERGE in place instead)
    staging = state_path + ".next-" + uuid.uuid4().hex[:8]
    _write(res.synced, staging)
    _write(res.quarantine, os.path.join(out, "quarantine"))
    _write(res.changelog, os.path.join(out, "changelog"))
    # counts that read `existing` must materialize BEFORE the swap deletes
    # the old state files (lazy plans re-execute on access)
    n_deleted = res.deletions.count()
    n_quarantined = res.quarantine.count()
    n_synced = spark.read.parquet(staging).count()
    spark.read.parquet(staging).write.mode("overwrite").parquet(state_path)
    shutil.rmtree(staging, ignore_errors=True)
    log = res.changelog.select(
        F.col("feed_id"),
        F.lit("").alias("agency_name"),
        F.lit("upserted").alias("action"),
        F.concat_ws(
            "/", F.col("valid_rows").cast("string"), F.col("total_rows").cast("string")
        ).alias("message"),
    )
    _write(run_summary(log, run_successful=True), os.path.join(out, "run_log"), "append")
    print(
        f"stops_map: synced={n_synced} quarantined={n_quarantined} "
        f"deleted={n_deleted} -> {state_path}"
    )
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="ntd_gtfs_to_socrata_spark")
    sub = ap.add_subparsers(dest="mode", required=True)
    for mode in ("catalog", "catalog_test"):
        p = sub.add_parser(mode)
        p.add_argument("--feeds", required=True)
        p.add_argument("--catalog", required=True)
        p.add_argument("--out", required=True)
    p = sub.add_parser("stops_map")
    p.add_argument("--zips", required=True)
    p.add_argument("--state", required=True)
    p.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    spark = get_spark(f"ntd-gtfs-{args.mode}")
    if args.mode in ("catalog", "catalog_test"):
        return run_catalog(
            spark, args.feeds, args.catalog, args.out, public=args.mode == "catalog"
        )
    return run_stops_map(spark, args.zips, args.state, args.out)


if __name__ == "__main__":
    sys.exit(main())
