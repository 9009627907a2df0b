"""The ``catalog`` pipeline (SURVEY.md §3 entry point 1) —
``updateCatalog`` (/root/reference/publish_to_catalog.py:519-545) as a
declarative flow:

    agency feeds (consent-filtered, P6)
      ⟕ catalog entries keyed by regex-extracted FeedID (J1a/J1, broadcast)
      → route create|update (J2)
      → build metadata doc + payload choice (P12/S12)
      → RevisionPublisher sink (S9, driver-side control plane)

The reference's per-row HTTP loop becomes: one broadcast join for routing +
one small control-plane frame handed to the publisher.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.operators import keys as K
from ntd_gtfs_to_socrata_spark.operators import merge as M
from ntd_gtfs_to_socrata_spark.operators import validation as V


def route_catalog(agency_feeds: DataFrame, catalog_entries: DataFrame) -> DataFrame:
    """Consent filter → key extraction → broadcast left join → action
    routing → metadata-doc assembly (the ``metadata`` builder of
    publish_to_catalog.py:375-411, null-safe via coalesce P12)."""
    feeds = agency_feeds.filter(F.col("have_consent_for_ntm"))
    keyed_catalog = (
        catalog_entries.withColumn("feed_id", K.extract_feed_id(F.col("description")))
        .filter(F.col("feed_id") != "")
        .select("feed_id", F.col("id").alias("existing_id"))
    )
    resolved = M.resolve_by_key(feeds, keyed_catalog, key="feed_id")
    routed = M.route_create_update(resolved, "existing_id")
    return routed.withColumn(
        "dataset_name",
        F.concat_ws(" - ", F.coalesce(F.col("agency_name"), F.lit("")), F.col("feed_id")),
    ).withColumn(
        "description_doc",
        F.concat(
            F.lit("\nFeed ID: "), F.col("feed_id"),
            F.lit("\nGTFS URL: "), F.coalesce(F.col("fetch_link"), F.lit("")),
            F.lit("\nAgency URL: "), F.coalesce(F.col("agency_website"), F.lit("")),
            F.lit("\n"),
        ),
    ).withColumn(
        "fetch_link_ok", F.coalesce(V.url_valid(F.col("fetch_link")), F.lit(False))
    )
