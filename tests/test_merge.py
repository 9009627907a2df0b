"""Merge-layer semantics (SURVEY.md §2.3 J3-J5): upsert precedence,
deterministic tiebreaks, full-sync idempotency (sync twice = fixpoint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.operators import merge as M


def _df(spark, rows, schema="k int, v string"):
    return spark.createDataFrame(rows, schema)


def test_upsert_incoming_wins(spark):
    existing = _df(spark, [(1, "old"), (2, "keep")])
    incoming = _df(spark, [(1, "new"), (3, "ins")])
    out = {r["k"]: r["v"] for r in M.upsert(existing, incoming, "k").collect()}
    assert out == {1: "new", 2: "keep", 3: "ins"}


def test_upsert_duplicate_incoming_tiebreak(spark):
    existing = _df(spark, [(1, "old")])
    incoming = _df(spark, [(1, "a"), (1, "b")])
    out = M.upsert(
        existing, incoming, "k", order_tiebreak=F.col("v").desc()
    ).collect()
    assert len(out) == 1 and out[0]["v"] == "b"


def test_upsert_schema_tolerant(spark):
    existing = _df(spark, [(1, "old")]).withColumn("extra", F.lit("e"))
    incoming = _df(spark, [(1, "new")])
    row = M.upsert(existing, incoming, "k").collect()[0]
    assert row["v"] == "new" and row["extra"] is None


def test_full_sync_is_idempotent_fixpoint(spark):
    existing = _df(spark, [(1, "old"), (2, "gone")])
    incoming = _df(spark, [(1, "new"), (3, "ins")])
    once = M.full_sync(existing, incoming, "k")
    twice = M.full_sync(once, incoming, "k")
    assert sorted((r["k"], r["v"]) for r in once.collect()) == [(1, "new"), (3, "ins")]
    assert sorted(once.collect()) == sorted(twice.collect())


def test_locate_deletions(spark):
    existing = _df(spark, [(1, "a"), (2, "b"), (3, "c")])
    incoming = _df(spark, [(2, "x")])
    out = sorted(r["k"] for r in M.locate_deletions(existing, incoming, "k").collect())
    assert out == [1, 3]
