"""Scalar-function surface (SURVEY.md §2.6) — semantics pinned to the
reference's plain-Python helpers (/root/reference/publish_to_catalog.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark import functions as NF


def test_clean_cell_matches_reference_strip(spark):
    # clearWhiteSpaces/stripNum (publish_to_catalog.py:148-154, 175-178):
    # trim, ' → ", strip surrounding quotes, trim again
    df = spark.createDataFrame(
        [('  "quoted"  ',), ("'45'",), (" plain ",), ("", ), (None,)], "s string"
    )
    got = [r[0] for r in df.select(NF.clean_cell(F.col("s"))).collect()]
    assert got == ["quoted", "45", "plain", "", None]


def test_field_or_empty_and_empty_as_null(spark):
    df = spark.createDataFrame([("x",), (None,), ("  ",)], "s string")
    filled = [r[0] for r in df.select(NF.field_or_empty(F.col("s"))).collect()]
    assert filled == ["x", "", "  "]
    nulled = [r[0] for r in df.select(NF.empty_as_null(F.col("s"))).collect()]
    assert nulled == ["x", None, None]


def test_json_helpers(spark):
    df = spark.createDataFrame([('{"a": "1", "b": "two"}',)], "j string")
    row = df.select(
        NF.json_field(F.col("j"), "b").alias("b"),
        NF.json_map(F.col("j")).alias("m"),
    ).first()
    assert row["b"] == "two"
    assert row["m"] == {"a": "1", "b": "two"}


def test_utf8_decode_strips_bom(spark):
    payload = "﻿feed_id,stop_id".encode("utf-8")
    df = spark.createDataFrame([(payload,)], "b binary")
    assert df.select(NF.utf8_decode(F.col("b"))).first()[0] == "feed_id,stop_id"


def test_csv_line_null_to_empty(spark):
    df = spark.createDataFrame([("a", None, "c")], "x string, y string, z string")
    line = df.select(NF.csv_line([F.col("x"), F.col("y"), F.col("z")])).first()[0]
    assert line == "a,,c"


def test_timestamp_formats(spark):
    df = spark.createDataFrame([("2026-08-13 01:02:03.000004",)], "t string").select(
        F.col("t").cast("timestamp").alias("t")
    )
    row = df.select(
        NF.run_date(F.col("t")).alias("d"), NF.log_timestamp(F.col("t")).alias("lt")
    ).first()
    assert row["d"] == "2026-08-13"
    assert row["lt"].startswith("2026-08-13T01:02:03.")
