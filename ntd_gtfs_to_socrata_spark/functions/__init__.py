"""Scalar-function surface (SURVEY.md §2.6, F1–F14) — one import point.

Every scalar helper the reference implements as a plain-Python function
(/root/reference/publish_to_catalog.py §2.6 inventory) re-expressed as a
native Column expression: JVM-side, whole-stage-codegen'd, zero
Python-worker cost. Helpers that belong to a specific operator family
(keys, validation, text) live with that family and are re-exported here so
user code has a single `from ntd_gtfs_to_socrata_spark import functions as
NF` surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# F1/F6 — trim + strip quotes + quote normalization (publish_to_catalog.py:148-178)
from ntd_gtfs_to_socrata_spark.sources.csv_ingest import clean_cell  # noqa: F401

# F3 — regex key extraction (publish_to_catalog.py:128-145); F5 — concat builders
from ntd_gtfs_to_socrata_spark.operators.keys import (  # noqa: F401
    extract_feed_id,
    extract_gtfs_url,
    surrogate_key,
    wkt_point,
)

# F4/F7/F8 — URL regex, float cast-probe, range checks (publish_to_catalog.py:83-200)
from ntd_gtfs_to_socrata_spark.operators.validation import (  # noqa: F401
    float_probe,
    url_valid,
)

# text-analysis hashes/ratios (north-star F14 companions)
from ntd_gtfs_to_socrata_spark.operators.textops import (  # noqa: F401
    char_poly_hash,
    punct_ratio,
    stopword_ratio,
    tokens,
    word_shingles,
)

# Reference timestamp layouts (publish_to_catalog.py:453, 576)
DATE_FMT = "yyyy-MM-dd"
LOG_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def run_date(ts: Column | None = None) -> Column:
    """F9: the reference's filename date ``%Y-%m-%d``
    (publish_to_catalog.py:453)."""
    return F.date_format(ts if ts is not None else F.current_timestamp(), DATE_FMT)


def log_timestamp(ts: Column | None = None) -> Column:
    """F9: the reference's log-row timestamp ``%Y-%m-%dT%H:%M:%S.%f``
    (publish_to_catalog.py:576)."""
    return F.date_format(ts if ts is not None else F.current_timestamp(), LOG_TS_FMT)


def field_or_empty(col: Column) -> Column:
    """F11: null → '' coalescing — ``getMetadataFieldIfExists``
    (publish_to_catalog.py:370-373)."""
    return F.coalesce(col, F.lit(""))


def empty_as_null(col: Column) -> Column:
    """F11 inverse: '' → null, so downstream null-semantics (coalesce,
    anti-join keys) treat reference empty-strings as absent."""
    return F.when(F.trim(col) == "", F.lit(None)).otherwise(col)


def json_field(col: Column, path: str) -> Column:
    """F12: single-field JSON decode (publish_to_catalog.py:52, 265...) —
    ``get_json_object`` avoids materializing a full struct for one field."""
    return F.get_json_object(col, f"$.{path}")


def json_map(col: Column) -> Column:
    """F12: decode a flat JSON object into MAP<STRING,STRING> (the
    changelog/props shape) for map-side ops without a fixed schema."""
    return F.from_json(col, T.MapType(T.StringType(), T.StringType()))


def utf8_decode(col: Column) -> Column:
    """F13: bytes → UTF-8 text with the BOM stripped — the reference's
    ``decode('UTF-8-sig')`` (publish_to_catalog.py:157)."""
    return F.regexp_replace(F.decode(col, "UTF-8"), "^﻿", "")


def csv_line(cols: list[Column]) -> Column:
    """F5: serialize columns to one CSV text line (the reference's output
    accumulation, publish_to_catalog.py:241-245) — sink-side only; keep
    data columnar until the last step."""
    return F.concat_ws(",", *[field_or_empty(c) for c in cols])
