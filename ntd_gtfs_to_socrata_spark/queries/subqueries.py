"""Subquery + skew-handling surface (SURVEY.md §2.3 J6/▲, §4).

The reference has no subqueries (its membership tests are Python ``in`` over
dicts — /root/reference/publish_to_catalog.py:279-281, 536); these queries
cover the Catalyst decorrelation surface a user of any SQL engine expects:
EXISTS → left-semi, NOT EXISTS → left-anti, IN-subquery, correlated scalar
subquery (per-group threshold), plus the salting pattern for skewed join
keys — result-identical to the plain join (proved by the oracle), but with
the hot key spread over N shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.io import load_table
from ntd_gtfs_to_socrata_spark.queries import register

# ---------------------------------------------------------------------------
# EXISTS → left-semi (TPC-H Q4 shape), through the SQL entry path
# ---------------------------------------------------------------------------

SQ_EXISTS_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
  )
GROUP BY o_orderpriority
"""


@register("sq_exists_semi_join", SQ_EXISTS_ORACLE)
def sq_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape via ``spark.sql`` over temp views — the SQL entry
    path into the same Catalyst pipeline as the DataFrame API. The EXISTS
    decorrelates to a left-semi hash join; the date filter pushes to the
    orders scan."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(SQ_EXISTS_ORACLE)


# ---------------------------------------------------------------------------
# NOT EXISTS → left-anti (TPC-H Q22 shape)
# ---------------------------------------------------------------------------

SQ_NOT_EXISTS_ORACLE = """
SELECT c_mktsegment, count(*) AS n_inactive,
       CAST(SUM(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS DOUBLE)
         / 100.0 AS total_bal
FROM customer
WHERE c_acctbal > 0
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_totalprice > 300000
  )
GROUP BY c_mktsegment
"""


@register("sq_not_exists_anti_join", SQ_NOT_EXISTS_ORACLE)
def sq_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: positive-balance customers with no large order —
    NOT EXISTS as an explicit left-anti join (the same plan Catalyst
    decorrelates the SQL form into); the price filter pushes to the
    orders scan before the anti-join."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    big = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        c.join(big, "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_inactive"),
            # exact money sum (r9 sf1-gate hardening): e2-quantized BIGINT
            (
                F.sum(F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long"))
                .cast("double")
                / 100.0
            ).alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# IN-subquery → left-semi over a derived key set
# ---------------------------------------------------------------------------

SQ_IN_ORACLE = """
SELECT o_orderstatus, count(*) AS n,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
         / 100.0 AS total
FROM orders
WHERE o_custkey IN (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
)
GROUP BY o_orderstatus
"""


@register("sq_in_subquery", SQ_IN_ORACLE)
def sq_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery as a left-semi join against the filtered key set; the
    segment filter pushes to the customer scan, and the (small) key side
    broadcast-hashes under AQE."""
    o = load_table(spark, sf_dir, "orders")
    keys = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "MACHINERY")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    return (
        o.join(keys, "o_custkey", "left_semi")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # exact money sum (r9 sf1-gate hardening): e2-quantized BIGINT
            (
                F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
                .cast("double")
                / 100.0
            ).alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery (TPC-H Q17 shape): per-group threshold
# ---------------------------------------------------------------------------

SQ_SCALAR_ORACLE = """
SELECT CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
       / 700.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
    SELECT 0.2 * avg(l_quantity) FROM lineitem li2 WHERE li2.l_partkey = p_partkey
  )
"""


@register("sq_correlated_scalar", SQ_SCALAR_ORACLE)
def sq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: rows below 20% of their group's average. The
    correlated scalar subquery decorrelates to a per-key aggregate joined
    back — written here as the explicit aggregate+join, which is also the
    plan shape that scales (one shuffle on partkey; the brand filter
    broadcasts so the threshold aggregate only computes for matching
    parts)."""
    li = load_table(spark, sf_dir, "lineitem")
    part_keys = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    branded = li.join(F.broadcast(part_keys), "l_partkey", "left_semi")
    thresholds = branded.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_threshold")
    )
    return (
        branded.join(thresholds, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            # exact money sum (r9 sf1-gate hardening): e2-quantized BIGINT
            (
                F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long"))
                .cast("double")
                / 700.0
            ).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# Salted join for skewed keys — result-identical to the plain join
# ---------------------------------------------------------------------------

N_SALTS = 8

SALTED_JOIN_ORACLE = """
WITH dim AS (
  SELECT DISTINCT o_orderpriority AS priority,
         CAST(length(o_orderpriority) AS BIGINT) AS weight
  FROM orders
)
SELECT o.o_orderstatus, count(*) AS n, CAST(sum(d.weight) AS BIGINT) AS total_weight
FROM orders o JOIN dim d ON o.o_orderpriority = d.priority
GROUP BY o.o_orderstatus
"""


@register("j6_salted_skew_join", SALTED_JOIN_ORACLE)
def j6_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salting pattern for skewed join keys (SURVEY.md §4): the fact
    side has only 5 distinct priority values (pathological skew — every
    row of a key lands on one reducer), so the fact key is widened with a
    deterministic salt (orderkey % N) and the dimension side is exploded
    into N replicas; the join runs on (key, salt) with N× the parallelism,
    and the aggregate proves the result identical to the unsalted join.

    At 100 TB you'd salt only the keys AQE's skew stats flag as hot, not
    every key; the plan shape is the same. (AQE skew-join handles the
    sort-merge case automatically; explicit salting is the portable form
    that also covers hash aggregation over skewed groups.)
    """
    o = load_table(spark, sf_dir, "orders")
    dim = (
        o.select(F.col("o_orderpriority").alias("priority"))
        .distinct()
        .withColumn("weight", F.length("priority").cast("long"))
    )
    fact = o.select("o_orderstatus", "o_orderpriority", "o_orderkey").withColumn(
        "salt", (F.col("o_orderkey") % N_SALTS).cast("int")
    )
    dim_salted = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1)))
    )
    # shuffle_hash hint: the replicated dim would otherwise broadcast (it is
    # tiny here), which sidesteps the shuffle the salt exists to spread —
    # at real scale the skewed side is far above the broadcast threshold.
    return (
        fact.join(
            dim_salted.hint("shuffle_hash"),
            (fact.o_orderpriority == dim_salted.priority)
            & (fact.salt == dim_salted.salt),
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("weight").alias("total_weight"))
    )


# ---------------------------------------------------------------------------
# LATERAL correlated subquery (top-k per row without a window)
# ---------------------------------------------------------------------------

SQ_LATERAL_ORACLE = """
SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS o_totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2
) t
WHERE c.c_nationkey = 3
"""


@register("sq_lateral_topk", SQ_LATERAL_ORACLE)
def sq_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer through a LATERAL correlated subquery —
    the SQL spelling of per-row top-k. Catalyst decorrelates the lateral
    into a join + per-key limit (DomainJoin rewrite), so what executes is
    the same partitioned-top-k shape as ``w3_topk_per_group``, never a
    per-customer re-scan of orders; the query exists to pin that the
    LATERAL surface (Spark 3.2+) is first-class and planner-rewritten.
    Same SQL text runs on DuckDB as the oracle."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(SQ_LATERAL_ORACLE)
