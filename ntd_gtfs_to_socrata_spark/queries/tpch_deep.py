"""Deep relational coverage: the remaining canonical TPC-H query shapes,
adapted to the fixture schema (no partsupp / shipmode / receiptdate — each
docstring notes the adaptation).

Why these matter beyond checkbox coverage (SURVEY.md §2.3/§2.4, SCALE.md):
every one exercises a distinct physical pattern the engine must get right
at 100 TB — semi/anti joins that never materialize the probe side, scalar
aggregate subqueries broadcast instead of recomputed per row, correlated
subqueries decorrelated into one pre-aggregation + join, outer-join
distributions, and double-EXISTS shapes folded into single-pass per-key
aggregates. The reference (publish_to_catalog.py) has none of this; these
are ▲ north-star operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.io import load_table
from ntd_gtfs_to_socrata_spark.queries import register

# ---------------------------------------------------------------------------
# Q4 order-priority check: EXISTS → left-semi join with a cross-side predicate
# ---------------------------------------------------------------------------

Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01'
  AND o_orderdate <  TIMESTAMP '1997-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


@register("q4_priority_exists", Q4_ORACLE)
def q4_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (commit<receipt adapted to shipdate>orderdate):
    EXISTS compiles to a LEFT SEMI hash join — the probe side is never
    materialized and each order short-circuits on its first matching line.
    The date filter stays pushed to the orders scan."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q7 volume shipping: nation-pair OR predicate across two dimension copies
# ---------------------------------------------------------------------------

Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume_e4) AS DOUBLE) / 10000.0 AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
              AS BIGINT) AS volume_e4
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register("q7_volume_shipping", Q7_ORACLE)
def q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same dimension (nation) joins twice under
    different roles, with a disjunctive pair predicate that only becomes
    checkable after both joins. Both nation copies broadcast; the pair OR
    runs as a post-join filter Catalyst keeps out of the join keys."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            # exact money sum (r9 sf1-gate hardening, the q1/q9 pattern)
            (
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                        + 0.5
                    ).cast("long")
                ).cast("double")
                / 10000.0
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q8 market share: conditional-sum ratio per year across an 8-table join
# ---------------------------------------------------------------------------

Q8_ORACLE = """
SELECT o_year,
       round(CAST(sum(CASE WHEN nation = 'NATION_5' THEN volume_e4 ELSE 0 END)
                  AS DOUBLE)
             / CAST(sum(volume_e4) AS DOUBLE), 4) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
              AS BIGINT) AS volume_e4,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01'
    AND p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
"""


@register("q8_market_share", Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: the widest star (part, supplier, orders, customer,
    nation×2, region) feeding a CASE-guarded share-of-total ratio. Every
    dimension broadcasts; the single fact shuffle is the orders⋈lineitem
    equi-join. The selective p_type filter lands on the broadcast build
    side, shrinking it before shipping."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    # exact money ratio (r9 sf1-gate hardening): per-row e4 quantization,
    # BIGINT sums, ratio of two exact integers cast to double
    volume_e4 = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + 0.5
    ).cast("long")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("nation") == "NATION_5", volume_e4).otherwise(F.lit(0))
                ).cast("double")
                / F.sum(volume_e4).cast("double"),
                4,
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q9 product-type profit (adapted: retail-cost proxy for ps_supplycost)
# ---------------------------------------------------------------------------

Q9_ORACLE = """
SELECT nation, o_year,
       CAST(SUM(amount_e4) AS BIGINT) / 10000.0 AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(year(l_shipdate) AS INT) AS o_year,
         CAST(floor((l_extendedprice * (1 - l_discount)
                     - 0.1 * p_retailprice * l_quantity) * 10000 + 0.5)
              AS BIGINT) AS amount_e4
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
"""


@register("q9_product_profit", Q9_ORACLE)
def q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (ps_supplycost → 10% of retail price, since the
    fixture has no partsupp): substring LIKE filter on the part dimension,
    profit expression spanning two tables, grouped by supplier nation and
    ship year. The %red% infix can't push to parquet as a range — it runs
    as a post-scan filter on the (broadcast) dimension, which is the right
    place: filter the 1-in-N dim, not the fact.

    EXACT money sum: profit MIXES signs (revenue - cost), so partial-agg
    order noise amplifies by cancellation — at sf1 it crossed the cent
    boundary the round(x, 2) convention guards (the one divergence of the
    full r9 sf1 gate). Each row's amount quantizes to 1e-4 units (the
    expression carries <= 4 decimals exactly) as a deterministic
    single-row double op, the sum is a BIGINT, and one division per GROUP
    recovers dollars — engines cannot disagree at any scale."""
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    amount_e4 = F.floor(amount * 10000 + 0.5).cast("long")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("o_year"),
        )
        .agg((F.sum(amount_e4).cast("long") / 10000.0).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q10 returned items: top-20 revenue-losing customers
# ---------------------------------------------------------------------------

Q10_ORACLE = """
SELECT c_custkey, c_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       round(c_acctbal, 2) AS acctbal, n_name, c_mktsegment
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-10-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


@register("q10_returned_items", Q10_ORACLE)
def q10_returned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: quarter of orders × returned lines only, grouped on
    a wide (5-column) customer key, global top-20 by lost revenue.
    Deterministic c_custkey tiebreak keeps the LIMIT edge stable;
    TakeOrderedAndProject avoids a full sort."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
            "c_mktsegment",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q11 important values: HAVING against a broadcast scalar-aggregate subquery
# ---------------------------------------------------------------------------

Q11_ORACLE = """
WITH supply AS (
  SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS raw_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT l_partkey AS partkey, round(raw_value, 2) AS value
FROM supply
WHERE raw_value > (SELECT sum(raw_value) * 0.001 FROM supply)
"""


@register("q11_important_values", Q11_ORACLE)
def q11_important(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp value → lineitem revenue per part):
    per-key aggregate filtered by a fraction-of-global-total scalar. The
    scalar re-aggregates the already-reduced per-part rows (cheap), then
    broadcasts into the filter via a 1-row cross join — never a correlated
    per-row recompute, never a single-partition window."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supply = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("raw_value"))
    )
    threshold = supply.agg((F.sum("raw_value") * 0.001).alias("threshold"))
    return (
        supply.join(F.broadcast(threshold))
        .filter(F.col("raw_value") > F.col("threshold"))
        .select(F.col("l_partkey").alias("partkey"), F.round("raw_value", 2).alias("value"))
    )


# ---------------------------------------------------------------------------
# Q12 priority counting (adapted: no shipmode → group by return flag)
# ---------------------------------------------------------------------------

Q12_ORACLE = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
"""


@register("q12_priority_counting", Q12_ORACLE)
def q12_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode → returnflag): equi-join with an extra
    cross-side inequality (shipped after ordered), CASE-bucketed counts.
    The year filter pushes to the lineitem scan; the cross-side predicate
    evaluates inside the join."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, (F.col("l_orderkey") == F.col("o_orderkey")) & (F.col("l_shipdate") > F.col("o_orderdate")))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q13 customer order distribution: outer join with an ON-clause filter
# ---------------------------------------------------------------------------

Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


@register("q13_order_distribution", Q13_ORACLE)
def q13_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join whose filter must live in the ON
    clause (a WHERE would erase the zero-order customers), count of
    non-null keys per customer, then a histogram of those counts. Two
    shuffles: join+count on custkey, histogram on c_count."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# ---------------------------------------------------------------------------
# Q15 top supplier: scalar MAX over a derived aggregate, joined back
# ---------------------------------------------------------------------------

Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@register("q15_top_supplier", Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: a derived per-supplier revenue view consumed twice
    — once for its MAX (1-row broadcast) and once as the join input.
    Rounded to cents on both sides BEFORE the max-equality so partial-sum
    ordering can't flip the winner. The per-supplier aggregate is small
    (|suppliers| rows), so the re-aggregation for the scalar is free
    relative to the lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    best = revenue.agg(F.max("total_revenue").alias("best_revenue"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("best_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Q16 supplier-part counts: NOT IN → anti join + multi-key distinct count
# ---------------------------------------------------------------------------

Q16_ORACLE = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type NOT LIKE 'SMALL%'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


@register("q16_supplier_part_counts", Q16_ORACLE)
def q16_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp → lineitem supply pairs, complaint
    suppliers → negative account balance): NOT IN over a non-nullable key
    compiles to a LEFT ANTI join (the null-aware trap doesn't apply), then
    COUNT(DISTINCT supplier) per part descriptor. The IN-list and NOT LIKE
    land on the broadcast part dimension."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#5")
            & ~F.col("p_type").like("SMALL%")
            & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_suppliers = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad_suppliers), li.l_suppkey == bad_suppliers.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17 small-quantity revenue: correlated AVG decorrelated to pre-agg + join
# ---------------------------------------------------------------------------

Q17_ORACLE = """
SELECT CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
       / 700.0 AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23' AND p_size < 5
  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
"""


@register("q17_small_quantity_revenue", Q17_ORACLE)
def q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: the canonical correlated-scalar-subquery
    decorrelation. The per-part AVG(quantity) is computed ONCE as a
    pre-aggregation over lineitem and joined back — versus the naive
    per-outer-row re-scan the SQL implies. At 100 TB the pre-agg output is
    |parts| rows (fact/30), broadcastable after the brand/size filter cuts
    it further."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#23") & (F.col("p_size") < 5))
        .select("p_partkey")
    )
    # Per-part threshold only needed for surviving parts: filter BEFORE the
    # avg aggregation by semi-joining lineitem down to the brand's parts.
    li_branded = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thresholds = li_branded.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li_branded.join(F.broadcast(thresholds), F.col("l_partkey") == F.col("t_partkey"))
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
# Q18 large-volume customers: IN over a HAVING aggregate → join on the agg
# ---------------------------------------------------------------------------

Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS raw_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
)
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o_totalprice, 2) AS totalprice,
       round(raw_qty, 2) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN big    ON o_orderkey = l_orderkey
"""


@register("q18_large_volume_customers", Q18_ORACLE)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN (SELECT ... GROUP BY ... HAVING agg > T)
    — implemented by joining the HAVING-filtered aggregate directly (it
    already carries the quantity sum, so no second lineitem pass the naive
    SQL shape implies). The aggregate output after HAVING is tiny (top ~1%
    of orders) → broadcast into orders."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .filter(F.col("raw_qty") > 250)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("raw_qty", 2).alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Q21 waiting suppliers: EXISTS + NOT EXISTS folded into per-order aggregates
# ---------------------------------------------------------------------------

Q21_ORACLE = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
  AND n_name = 'NATION_3'
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 10
"""


@register("q21_waiting_suppliers", Q21_ORACLE)
def q21_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (late = shipped >90 days after ordering, since the
    fixture lacks commit/receipt dates): the hardest subquery pattern —
    EXISTS and NOT EXISTS both correlated to the same outer row. Both fold
    into per-order facts over ONE lineitem⋈orders pass:
    - EXISTS another supplier        ⇔ n_distinct_suppliers(order) > 1
    - NOT EXISTS another LATE suppl. ⇔ n_distinct_late_suppliers(order) = 1
      (the late outer row's own supplier is always in the late set).
    (EXISTS l2 is status-unrestricted in the SQL, but l2 shares the outer
    row's order, which the WHERE already pins to status 'F' — so computing
    it from the F-only join loses nothing.)
    Physical shape: lineitem is scanned ONCE (the naive form reads it
    three times / six shuffles). At 100 TB the orders side exceeds the
    broadcast threshold, the join becomes a sort-merge on orderkey, and
    both the (orderkey, suppkey) aggregate and the orderkey window REUSE
    that hash(orderkey) partitioning (subset-satisfies rule) — zero extra
    exchanges. At fixture scale orders-F broadcasts instead, costing one
    small exchange of the already-reduced per-supplier rows."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    lines = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias(
            "is_late"
        ),
    )
    per_supplier = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum(F.when(F.col("is_late"), 1).otherwise(0)).alias("n_late_lines")
    )
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy("l_orderkey")
    per_order = per_supplier.select(
        "l_orderkey",
        "l_suppkey",
        "n_late_lines",
        F.count(F.lit(1)).over(w).alias("n_suppliers"),
        F.sum((F.col("n_late_lines") > 0).cast("int")).over(w).alias("n_late_suppliers"),
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        per_order.filter(
            (F.col("n_late_lines") > 0)
            & (F.col("n_suppliers") > 1)
            & (F.col("n_late_suppliers") == 1)
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q22 global sales opportunity: anti join + scalar AVG subquery
# ---------------------------------------------------------------------------

Q22_ORACLE = """
SELECT c_mktsegment, count(*) AS numcust,
       CAST(SUM(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS DOUBLE)
         / 100.0 AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
"""


@register("q22_sales_opportunity", Q22_ORACLE)
def q22_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (phone prefixes → market segments; "no orders" →
    "no orders since 2000", since every fixture customer has some order):
    an uncorrelated scalar AVG broadcast into the filter, plus NOT EXISTS
    as a LEFT ANTI join against the date-filtered orders. The anti join's
    build side only needs the distinct custkeys — Spark keeps the hash
    set, never the order rows."""
    c = load_table(spark, sf_dir, "customer")
    segs = c.filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY"))
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("avg_bal"))
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        segs.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, segs.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            # exact money sum (r9 sf1-gate hardening): acctbal mixes signs
            (
                F.sum(F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long"))
                .cast("double")
                / 100.0
            ).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Q2 minimum-cost supplier (correlated MIN joined back)
# ---------------------------------------------------------------------------

Q2_ORACLE = """
WITH costs AS (
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey, l_suppkey
),
best AS (
  SELECT l_partkey, min(unit_cost) AS best_cost FROM costs GROUP BY l_partkey
)
SELECT p_partkey, p_brand, s_name,
       floor(c.unit_cost * 10000 + 0.5) / 10000 AS unit_cost
FROM part
JOIN costs c ON p_partkey = c.l_partkey
JOIN best b  ON c.l_partkey = b.l_partkey AND c.unit_cost = b.best_cost
JOIN supplier ON c.l_suppkey = s_suppkey
WHERE p_size = 15
ORDER BY unit_cost ASC, p_partkey ASC, s_name ASC
LIMIT 100
"""


@register("q2_min_cost_supplier", Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (ps_supplycost → observed min unit price from
    lineitem): the correlated `= (SELECT min(...) WHERE correlation)`
    subquery decorrelated into a per-key MIN aggregate joined back — the
    same pattern as Q17's AVG but with the extra twist that the
    aggregation feeding `best` is itself derived from a filtered join
    (EUROPE suppliers only), and the min must be matched EXACTLY (ties
    keep every best-cost supplier, as the SQL semantics require).

    Scale posture: `costs` reduces lineitem to |part×supplier-in-region|
    rows before any join-back; `best` reuses the l_partkey partitioning
    from `costs` (subset-satisfies); the equality join-back on
    (partkey, cost) is on already-reduced frames."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    euro_sup = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name")
    )
    costs = (
        li.join(F.broadcast(euro_sup), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    best = costs.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_cost").alias("best_cost")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15).select(
        "p_partkey", "p_brand"
    )
    return (
        costs.join(
            best,
            (costs.l_partkey == best.b_partkey) & (costs.unit_cost == best.best_cost),
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(euro_sup), F.col("l_suppkey") == F.col("s_suppkey"))
        # floor-based half-up rounding, NOT round(): the two engines
        # disagree on round() when the quotient double sits on the
        # .xxxx5 boundary (caught by the r7 sf0.1 cross-scale gate:
        # 2410.85/40 = 60.27125 rounded down by Spark, up by DuckDB);
        # x*1e4+0.5 then floor is bit-identical double arithmetic in both
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            (F.floor(F.col("unit_cost") * 10000 + F.lit(0.5)) / 10000).alias(
                "unit_cost"
            ),
        )
        .orderBy(F.col("unit_cost").asc(), F.col("p_partkey").asc(), F.col("s_name").asc())
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q20 nested-IN supplier selection (share-of-volume threshold)
# ---------------------------------------------------------------------------

Q20_ORACLE = """
WITH red_parts AS (
  SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
),
supply AS (
  SELECT l_suppkey, l_partkey, sum(l_quantity) AS supplied
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM red_parts)
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey, l_partkey
),
part_total AS (
  SELECT l_partkey, sum(supplied) AS total FROM supply GROUP BY l_partkey
)
SELECT s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT s2.l_suppkey FROM supply s2
  JOIN part_total t ON s2.l_partkey = t.l_partkey
  WHERE s2.supplied > 0.2 * t.total
)
ORDER BY s_name
"""


@register("q20_volume_share_suppliers", Q20_ORACLE)
def q20_volume_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (partsupp availability → supplied share of a
    part's annual volume): the nested IN-chain — suppliers IN (those who
    supplied > 20% of some red part's volume), parts IN (name-prefix
    filter) — flattened into two aggregations + a semi join. The
    `part_total` aggregate reuses `supply`'s l_partkey grouping rather
    than re-scanning lineitem; the final IN is a LEFT SEMI against the
    qualifying supplier keys."""
    red_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    supply = (
        li.join(F.broadcast(red_parts), li.l_partkey == red_parts.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("supplied"))
    )
    part_total = supply.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("supplied").alias("total")
    )
    qualifying = (
        supply.join(part_total, supply.l_partkey == F.col("t_partkey"))
        .filter(F.col("supplied") > 0.2 * F.col("total"))
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(qualifying), s.s_suppkey == qualifying.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
