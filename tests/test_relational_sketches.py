"""Sketch-based aggregates (a6_approx_*): bounded error / superset
guarantees against their exact counterparts — the correctness contract for
the 100 TB defaults where exact computation is the exception."""

from __future__ import annotations

from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.io import load_table
from ntd_gtfs_to_socrata_spark.queries.relational import (
    a6_approx_distinct,
    a6_approx_percentiles,
    a6_freq_items,
    a6_percentiles,
)


def test_approx_percentiles_within_tolerance(spark, sf_dir):
    exact = {r["l_returnflag"]: r for r in a6_percentiles(spark, sf_dir).collect()}
    approx = {r["l_returnflag"]: r for r in a6_approx_percentiles(spark, sf_dir).collect()}
    assert exact.keys() == approx.keys()
    for flag, e in exact.items():
        a = approx[flag]
        assert abs(a["median_qty"] - e["median_qty"]) <= max(0.05 * e["median_qty"], 1.0)
        assert abs(a["p95_price"] - e["p95_price"]) <= 0.05 * e["p95_price"]


def test_freq_items_superset_of_true_heavy_hitters(spark, sf_dir):
    rows = a6_freq_items(spark, sf_dir).collect()
    assert len(rows) == 1
    got_prio = set(rows[0]["hot_priorities"])
    o = load_table(spark, sf_dir, "orders")
    n = o.count()
    true_hot = {
        r["o_orderpriority"]
        for r in o.groupBy("o_orderpriority").count().collect()
        if r["count"] / n >= 0.2
    }
    # freqItems may over-report but must never miss a true heavy hitter
    assert true_hot <= got_prio


def test_approx_distinct_within_relative_error(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: (r["n_orders"], r["n_parts"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.countDistinct("l_partkey").alias("n_parts"),
        )
        .collect()
    }
    approx = {
        r["l_returnflag"]: (r["approx_orders"], r["approx_parts"])
        for r in a6_approx_distinct(spark, sf_dir).collect()
    }
    for flag, (eo, ep) in exact.items():
        ao, ap = approx[flag]
        assert abs(ao - eo) <= 0.1 * eo
        assert abs(ap - ep) <= 0.1 * ep


def test_count_min_never_underestimates_and_bounded_overshoot(spark, sf_dir):
    """CMS guarantee: estimates never undercount; min-over-d keeps the
    collision bias within a few stream-fractions of the bucket width."""
    from ntd_gtfs_to_socrata_spark.io import load_table
    from ntd_gtfs_to_socrata_spark.queries.relational import (
        _CMS_W,
        a6_count_min_heavy_hitters,
    )

    rows = a6_count_min_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == 20
    assert all(r["never_under"] for r in rows)
    n_stream = load_table(spark, sf_dir, "lineitem").count()
    bound = 4 * n_stream / _CMS_W
    for r in rows:
        overshoot = r["est_n"] - r["exact_n"]
        assert 0 <= overshoot <= bound, (r["partkey"], overshoot, bound)
