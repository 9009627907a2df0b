"""Subquery decorrelation + salted-skew-join surface (queries/subqueries.py).

Correctness is oracle-checked by the driver gate; these tests pin the plan
shapes: EXISTS compiles to a semi join, NOT EXISTS to an anti join, and the
salted join actually shuffles on the widened (key, salt) tuple instead of
broadcasting — the property that spreads a hot key over N reducers.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from ntd_gtfs_to_socrata_spark.queries.subqueries import (
    N_SALTS,
    j6_salted,
    sq_exists,
    sq_in,
    sq_not_exists,
    sq_scalar,
)


def plan_text(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_exists_decorrelates_to_semi_join(spark, sf_dir):
    plan = plan_text(sq_exists(spark, sf_dir))
    assert "LeftSemi" in plan


def test_not_exists_is_anti_join(spark, sf_dir):
    plan = plan_text(sq_not_exists(spark, sf_dir))
    assert "LeftAnti" in plan


def test_in_subquery_is_semi_join(spark, sf_dir):
    plan = plan_text(sq_in(spark, sf_dir))
    assert "LeftSemi" in plan


def test_correlated_scalar_filters_before_aggregate(spark, sf_dir):
    """The decorrelated form computes thresholds only for the branded
    partkeys (semi-join first), then one row out."""
    df = sq_scalar(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 1
    plan = plan_text(df)
    assert "LeftSemi" in plan


def test_salted_join_shuffles_on_salt_not_broadcast(spark, sf_dir):
    plan = plan_text(j6_salted(spark, sf_dir))
    assert "BroadcastHashJoin" not in plan
    assert "salt" in plan  # the widened key reaches the exchange


def test_salted_join_matches_unsalted(spark, sf_dir):
    from pyspark.sql import functions as F

    from ntd_gtfs_to_socrata_spark.io import load_table

    o = load_table(spark, sf_dir, "orders")
    dim = (
        o.select(F.col("o_orderpriority").alias("priority"))
        .distinct()
        .withColumn("weight", F.length("priority").cast("long"))
    )
    plain = (
        o.join(dim, o.o_orderpriority == dim.priority)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("weight").alias("total_weight"))
    )
    got = {r["o_orderstatus"]: (r["n"], r["total_weight"]) for r in j6_salted(spark, sf_dir).collect()}
    want = {r["o_orderstatus"]: (r["n"], r["total_weight"]) for r in plain.collect()}
    assert got == want
    assert N_SALTS > 1
