"""Validation parity with the reference's float()-probe semantics
(/root/reference/publish_to_catalog.py:181-200) on FIXTURES.md §B1 dirty
variants, plus the A1 identity valid+invalid=total."""

from __future__ import annotations

from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.operators import changelog as CL
from ntd_gtfs_to_socrata_spark.operators import validation as V

DIRTY = [
    # (stop_lat, stop_lon, location_type, expect_valid)
    ("45.5", "-122.6", "", True),
    (" 45 ", " 122 ", "1", True),          # padded — float() accepts
    ("1e1", "-1e2", "0.0", True),          # sci notation
    ("nan", "0", "", False),               # NaN fails >= -90
    ("inf", "0", "", False),               # inf fails <= 90
    ("Main & 3rd", "0", "", False),        # the L247 TODO case
    ("95.0", "0", "", False),              # out of range lat
    ("0", "-200", "", False),              # out of range lon
    ("'45.5'", "0", "", False),            # unstripped quotes don't cast
    ("0", "0", "station", False),          # non-numeric location_type
    ("0", "0", None, True),                # omitted location_type
]


def _df(spark):
    return spark.createDataFrame(
        [(lat, lon, lt, exp) for lat, lon, lt, exp in DIRTY],
        "stop_lat string, stop_lon string, location_type string, expect boolean",
    )


def test_dirty_variant_parity(spark):
    df = _df(spark)
    flag = V.coordinates_valid(F.col("stop_lat"), F.col("stop_lon")) & V.location_type_valid(
        F.col("location_type")
    )
    rows = df.withColumn("got", flag).collect()
    for r in rows:
        assert r["got"] == r["expect"], (r["stop_lat"], r["stop_lon"], r["location_type"])


def test_split_covers_all_rows(spark):
    df = _df(spark)
    flag = V.coordinates_valid(F.col("stop_lat"), F.col("stop_lon"))
    clean, quarantine = V.split_valid_invalid(df, flag)
    assert clean.count() + quarantine.count() == df.count()


def test_quarantine_count_identity(spark):
    df = _df(spark).withColumn(
        "is_valid",
        V.coordinates_valid(F.col("stop_lat"), F.col("stop_lon")),
    ).withColumn("grp", F.lit("g"))
    row = CL.quarantine_counts(df, "grp").collect()[0]
    assert row["valid_rows"] + row["invalid_rows"] == row["total_rows"]


def test_url_regex(spark):
    cases = [
        ("https://example.com/gtfs.zip", True),
        ("http://sub.example.org", True),
        ("ftp://files.example.com/a/b", True),
        ("notaurl", False),
        ("http://nodot", False),
        (None, False),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = df.select(F.coalesce(V.url_valid(F.col("url")), F.lit(False)).alias("ok")).collect()
    assert [r["ok"] for r in got] == [e for _, e in cases]
