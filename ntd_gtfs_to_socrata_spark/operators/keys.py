"""Derived keys & join-key extraction (SURVEY.md §2.2 P3/P4, §2.3 J1a).

- P3 surrogate key — ``feed_id + '_' + stop_id``
  (/root/reference/publish_to_catalog.py:237).
- P4 WKT point — ``'POINT(lon lat)'`` (publish_to_catalog.py:236).
- J1a regex join-key extraction — FeedID parsed out of a free-text
  description field, ``getCatalogEntryFeedID``
  (publish_to_catalog.py:137-145), and the GTFS-URL extraction sibling
  ``getGtfsUrlFromFeedDescription`` (publish_to_catalog.py:128-134).

All pure Column expressions — codegen'd, shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FEED_ID_PATTERN = r"\nFeed ID: (.+)\n"
GTFS_URL_PATTERN = r"\nGTFS URL: (.+)\nAgency URL:"


def surrogate_key(*parts: Column, sep: str = "_") -> Column:
    """P3: null-tolerant key concat (publish_to_catalog.py:237)."""
    return F.concat_ws(sep, *parts)


def wkt_point(lon: Column, lat: Column) -> Column:
    """P4: WKT text geometry (publish_to_catalog.py:236)."""
    return F.concat(F.lit("POINT("), lon, F.lit(" "), lat, F.lit(")"))


def extract_feed_id(description: Column) -> Column:
    """J1a: regex key extraction; '' when the marker is absent — the
    reference returns None (publish_to_catalog.py:140-141); callers treat
    empty as no-match."""
    return F.regexp_extract(description, FEED_ID_PATTERN, 1)


def extract_gtfs_url(description: Column) -> Column:
    return F.regexp_extract(description, GTFS_URL_PATTERN, 1)
