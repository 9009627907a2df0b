"""Header-inferred, dirt-tolerant CSV ingestion (SURVEY.md §2.1 S6, §2.6
F1-F2, §1.3).

Reproduces ``makeStopsObject`` + ``clearWhiteSpaces`` + ``stripNum``
(/root/reference/publish_to_catalog.py:148-178, 156-171) as a scan +
Column-expression normalization:

- header row defines the schema at runtime (``header=True``);
- UTF-8 BOM stripped (the reference decodes UTF-8-sig, L157);
- per-cell whitespace trim and surrounding-quote strip (L148-154);
- single→double quote normalization before stripping (L177);
- short/empty lines dropped (L166);
- schema tolerance: projection onto a canonical target layout where absent
  source columns become nulls (P2; the reference instead emits
  variable-width rows — documented deviation, SURVEY.md §7).

Scale: one ``spark.read.csv`` over a path glob = parallel scan of any
number of files; normalization is codegen'd, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# GTFS stops.txt canonical target layout (publish_to_catalog.py:208-226).
TARGET_STOP_COLUMNS = [
    "stop_id",
    "stop_code",
    "stop_name",
    "stop_lat",
    "stop_lon",
    "zone_id",
    "location_type",
]


def clean_cell(col: Column) -> Column:
    """F1/F6 (publish_to_catalog.py:148-154, 175-178): trim whitespace,
    normalize ' to \", strip surrounding quotes, trim again."""
    c = F.trim(col)
    c = F.translate(c, "'", '"')
    c = F.regexp_replace(c, r'^"+|"+$', "")
    return F.trim(c)


def read_headed_csv(spark: SparkSession, path: str) -> DataFrame:
    """S6: runtime-header CSV scan, all columns as raw strings; BOM on the
    first header name stripped (UTF-8-sig analog)."""
    df = (
        spark.read.option("header", True)
        .option("inferSchema", False)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    # Spark keeps a leading BOM inside the first header name
    renames = {c: c.lstrip("﻿").strip() for c in df.columns}
    for old, new in renames.items():
        if old != new:
            df = df.withColumnRenamed(old, new)
    return df


def normalize_cells(df: DataFrame) -> DataFrame:
    """Apply clean_cell to every column (the per-cell loop of L163-170,
    as one codegen'd projection)."""
    return df.select(*[clean_cell(F.col(c)).alias(c) for c in df.columns])


def drop_short_rows(df: DataFrame, min_fields: int = 2) -> DataFrame:
    """L166: lines with ≤1 parsed field are noise (trailing newlines,
    stray values) — require ≥min_fields non-empty cells."""
    non_empty = [
        F.when(F.col(c).isNotNull() & (F.col(c) != ""), 1).otherwise(0)
        for c in df.columns
    ]
    total = non_empty[0]
    for x in non_empty[1:]:
        total = total + x
    return df.filter(total >= min_fields)


def conform_to_target(df: DataFrame, target: list[str] | None = None) -> DataFrame:
    """P2 (publish_to_catalog.py:207-245): project onto the canonical
    layout; absent columns become nulls (OMIT sentinel → NULL)."""
    target = target or TARGET_STOP_COLUMNS
    present = set(df.columns)
    return df.select(
        *[
            (F.col(c) if c in present else F.lit(None).cast("string")).alias(c)
            for c in target
        ]
    )


def read_stops_csv(spark: SparkSession, path: str) -> DataFrame:
    """The full S6 pipeline: scan → normalize → drop short rows → conform."""
    return conform_to_target(drop_short_rows(normalize_cells(read_headed_csv(spark, path))))
