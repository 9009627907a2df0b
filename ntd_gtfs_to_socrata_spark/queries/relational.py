"""Relational analytics surface (SURVEY.md §2.3 J6, §2.4 A6, §2.5 W2-W4,
§2.6 F14) over the TPC-H-ish fixture tables.

These are the ▲ north-star operators the reference lacks entirely (its only
"joins" are hand-rolled nested loops): hash/broadcast/sort-merge equi-joins,
multi-way star joins, ranking/analytic windows, top-k per group, set ops,
rollup/cube, and the scalar-function sweep. Every query is a declarative
plan — Catalyst picks broadcast for the small dims (region/nation/supplier),
AQE handles skew/coalescing at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.io import load_table
from ntd_gtfs_to_socrata_spark.queries import register

# ---------------------------------------------------------------------------
# Q1 pricing summary (TPC-H Q1 shape): scan-heavy groupBy + 8 aggregates
# ---------------------------------------------------------------------------

Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
         / 100.0 AS sum_base_price,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                     AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                           * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
         / 1000000.0 AS sum_charge,
       round(avg(l_quantity), 2) AS avg_qty,
       round(avg(l_extendedprice), 2) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", Q1_ORACLE)
def q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: filter pushed to the parquet scan, partial+final
    hash aggregation, whole-stage codegen throughout — the canonical
    scan-bound query at 100 TB.

    EXACT money sums (r9 sf1-gate hardening): Q1's groups are
    corpus-sized (1/4 of lineitem each), so partial-agg order noise on
    double sums grows with scale and eventually crosses the cent
    boundary round(x, 2) guards (q9 crossed it at sf1). Each money term
    quantizes per row at its exact decimal width (price 2dp -> 1e2,
    disc_price 4dp -> 1e4, charge 6dp -> 1e6) — a deterministic
    single-row double op — then sums as BIGINT (charge_e6 stays under
    2^63 to ~sf1500). sum_qty (integer-valued) and the avgs (noise
    shrinks as 1/n) keep the round convention."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base_e2 = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    disc_e4 = F.floor(disc_price * 10000 + 0.5).cast("long")
    charge_e6 = F.floor(
        disc_price * (1 + F.col("l_tax")) * 1000000 + 0.5
    ).cast("long")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            (F.sum(base_e2).cast("long") / 100.0).alias("sum_base_price"),
            (F.sum(disc_e4).cast("long") / 10000.0).alias("sum_disc_price"),
            (F.sum(charge_e6).cast("long") / 1000000.0).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Q3 shipping priority: 3-way join + agg + deterministic top-k
# ---------------------------------------------------------------------------

Q3_ORACLE = """
WITH revenue AS (
  SELECT l_orderkey,
         strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
         o_orderpriority,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1998-03-15'
    AND l_shipdate  > TIMESTAMP '1996-03-15'
  GROUP BY l_orderkey, orderdate, o_orderpriority
)
SELECT l_orderkey, orderdate, o_orderpriority, revenue
FROM revenue
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


@register("q3_shipping_priority_topk", Q3_ORACLE)
def q3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dimension filter → join → agg → global
    top-k. Deterministic tiebreak (orderkey) so the LIMIT edge is stable.
    TakeOrderedAndProject = no full sort of the agg output at scale."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q5 local-supplier revenue: 6-way star join
# ---------------------------------------------------------------------------

Q5_ORACLE = """
SELECT n_name,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                     AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


@register("q5_region_revenue", Q5_ORACLE)
def q5_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join where region/nation/supplier broadcast
    (small dims) so the fact table shuffles at most once for the
    customer⋈orders equi-join; Catalyst reorders freely.

    Join-order note: the region filter only reaches customers through
    c_nationkey = s_nationkey, which Catalyst cannot propagate across the
    join tree — so we pre-filter customers to ASIA nations explicitly
    (broadcast semi join against nation⋈region). That cuts the
    customer⋈orders⋈lineitem shuffle volume ~5× (1/|regions|) before the
    big joins instead of discarding those rows after them. Semantics are
    unchanged: any row surviving the later c_nationkey = s_nationkey ∧
    supplier-in-ASIA condition has its customer in ASIA."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_keys = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select(F.col("n_nationkey").alias("asia_nationkey"))
    c = load_table(spark, sf_dir, "customer").join(
        F.broadcast(asia_keys),
        F.col("c_nationkey") == F.col("asia_nationkey"),
        "left_semi",
    )
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            # exact money sum (r9 sf1-gate hardening, the q1/q9 pattern):
            # per-nation groups are corpus-sized, so quantize per row
            (
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                        + 0.5
                    ).cast("long")
                ).cast("long")
                / 10000.0
            ).alias(
                "revenue"
            )
        )
    )


# ---------------------------------------------------------------------------
# Q6 forecast revenue: the pure-pushdown aggregate
# ---------------------------------------------------------------------------

Q6_ORACLE = """
SELECT CAST(SUM(CAST(floor(l_extendedprice * l_discount * 10000 + 0.5)
                     AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", Q6_ORACLE)
def q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: every predicate reaches the parquet scan
    (PushedFilters on date, discount range, quantity), aggregate collapses
    to a single row — the query that measures pure scan throughput at
    100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            # exact money sum (r9 sf1-gate hardening): ONE group over the
            # whole filtered fact — the largest-n sum in the registry
            (
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * F.col("l_discount") * 10000 + 0.5
                    ).cast("long")
                ).cast("long")
                / 10000.0
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q14 promo revenue: conditional aggregation over a join
# ---------------------------------------------------------------------------

Q14_ORACLE = """
SELECT round(
         100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                           THEN CAST(floor(l_extendedprice * (1 - l_discount)
                                           * 10000 + 0.5) AS BIGINT)
                           ELSE 0 END) AS DOUBLE)
         / CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                         AS BIGINT)) AS DOUBLE), 4) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate <  TIMESTAMP '1997-04-01'
"""


@register("q14_promo_revenue", Q14_ORACLE)
def q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: selective date filter on the fact side, broadcast
    part dimension, conditional (CASE-guarded) aggregate ratio."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    # exact money ratio (r9 sf1-gate hardening): both legs quantize per
    # row to 1e-4 units and sum as BIGINT; the ratio divides two exact
    # integers cast to double (sums stay under 2^53 to ~sf100)
    disc_e4 = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + 0.5
    ).cast("long")
    promo_e4 = F.when(F.col("p_type").like("PROMO%"), disc_e4).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(promo_e4).cast("double") / F.sum(disc_e4).cast("double"),
                4,
            ).alias("promo_pct")
        )
    )


# ---------------------------------------------------------------------------
# Q19 disjunctive predicate join: Catalyst predicate-decomposition stress
# ---------------------------------------------------------------------------

Q19_ORACLE = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


@register("q19_disjunctive_join", Q19_ORACLE)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: a disjunction of conjunctive brand/size/quantity
    clauses across both join sides. Catalyst extracts the common
    single-side conjuncts (p_size >= 1, quantity bounds) below the join
    and keeps the residual OR as the join filter — written as one
    declarative condition, not three unioned scans."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), (li.l_partkey == p.p_partkey) & clause)
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# W2 ranking + analytic window functions
# ---------------------------------------------------------------------------

W2_ORACLE = """
SELECT o_orderkey,
       row_number() OVER w AS rn,
       rank()       OVER (PARTITION BY o_custkey ORDER BY CAST(floor(o_totalprice * 100) AS BIGINT) DESC) AS price_rank,
       date_diff('day',
                 lag(o_orderdate) OVER w,
                 o_orderdate) AS days_since_prev,
       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS running_cents
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("w2_window_functions", W2_ORACLE)
def w2_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: ranking (row_number/rank), analytic (lag), and a running-frame
    aggregate. One shuffle on the partition key; frames evaluated in a
    single sort per partition."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_price = Window.partitionBy("o_custkey").orderBy(
        F.floor(F.col("o_totalprice") * 100).desc()
    )
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w_price).alias("price_rank"),
        F.datediff("o_orderdate", F.lag("o_orderdate").over(w))
        .cast("long")
        .alias("days_since_prev"),
        # integer-domain running sum: float running sums differ between
        # engines (DuckDB windows aggregate via segment trees, Spark
        # incrementally — different addition order, different low bits)
        F.sum(F.floor(F.col("o_totalprice") * 100)).over(running).alias("running_cents"),
    )


# ---------------------------------------------------------------------------
# W3 top-k per group
# ---------------------------------------------------------------------------

W3_ORACLE = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY floor(o_totalprice * 100) DESC, o_orderkey ASC) AS rn
  FROM orders
)
SELECT o_custkey, o_orderkey, price_cents, rn FROM ranked WHERE rn <= 3
"""


@register("w3_topk_per_group", W3_ORACLE)
def w3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: top-3 orders per customer — window + filter; Spark pushes the
    rn<=3 limit into the window sort (WindowGroupLimit) so only k rows per
    group are kept through the shuffle."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.floor(F.col("o_totalprice") * 100).desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.floor(F.col("o_totalprice") * 100).alias("price_cents"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# W4 set operations
# ---------------------------------------------------------------------------

W4_ORACLE = """
WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
     o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
SELECT 'intersect' AS op, count(*) AS n FROM (SELECT * FROM f INTERSECT SELECT * FROM o)
UNION ALL
SELECT 'except' AS op, count(*) AS n FROM (SELECT * FROM f EXCEPT SELECT * FROM o)
UNION ALL
SELECT 'union' AS op, count(*) AS n FROM (SELECT * FROM f UNION SELECT * FROM o)
"""


@register("w4_set_ops", W4_ORACLE)
def w4_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: intersect / except / union-distinct — the reference's closest
    cousin is the valid∪invalid partition (SURVEY.md §2.5)."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()

    def tagged(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(name).alias("op"), "n")

    return (
        tagged("intersect", f.intersect(o))
        .unionByName(tagged("except", f.exceptAll(o).distinct()))
        .unionByName(tagged("union", f.union(o).distinct()))
    )


@register("w4_set_ops_single_pass", W4_ORACLE)
def w4_set_ops_single_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB rewrite of ``w4_set_ops``: the three set-op cardinalities
    from ONE shuffle instead of nine. Each branch of intersect/except/union
    re-reads and re-distincts its inputs; aggregating per-key membership
    flags (bool_or per side) computes all three simultaneously — the
    standard trick when several set ops share inputs. Identical oracle."""
    orders = load_table(spark, sf_dir, "orders")
    flags = (
        orders.filter(F.col("o_orderstatus").isin("F", "O"))
        .groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderstatus") == "F").alias("in_f"),
            F.max(F.col("o_orderstatus") == "O").alias("in_o"),
        )
    )
    counts = flags.agg(
        F.sum((F.col("in_f") & F.col("in_o")).cast("long")).alias("n_intersect"),
        F.sum((F.col("in_f") & ~F.col("in_o")).cast("long")).alias("n_except"),
        F.count(F.lit(1)).alias("n_union"),
    )
    return counts.selectExpr(
        "stack(3, 'intersect', n_intersect, 'except', n_except, 'union', n_union) AS (op, n)"
    )


# ---------------------------------------------------------------------------
# A6 rollup / cube / distinct aggregates
# ---------------------------------------------------------------------------

A6_ROLLUP_ORACLE = """
SELECT grouping(l_returnflag, l_linestatus) AS gid,
       l_returnflag, l_linestatus,
       count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


@register("a6_rollup", A6_ROLLUP_ORACLE)
def a6_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: hierarchical totals via ROLLUP — one pass, grouping-set
    expansion handled by the aggregate itself (no self-union)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select("gid", "l_returnflag", "l_linestatus", "n", "sum_qty")
    )


A6_CUBE_ORACLE = """
SELECT grouping(o_orderstatus, o_orderpriority) AS gid,
       o_orderstatus, o_orderpriority,
       count(*) AS n, CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
         / 100.0 AS total
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


@register("a6_cube", A6_CUBE_ORACLE)
def a6_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "orders")
    return (
        li.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            # exact money sum (r9 sf1-gate hardening): e2-quantized BIGINT
            (
                F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
                .cast("double")
                / 100.0
            ).alias("total"),
        )
        .select("gid", "o_orderstatus", "o_orderpriority", "n", "total")
    )


A6_GROUPING_SETS_ORACLE = """
SELECT grouping(o_orderstatus, o_orderpriority) AS gid,
       o_orderstatus, o_orderpriority,
       count(*) AS n, CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
         / 100.0 AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register("a6_grouping_sets", A6_GROUPING_SETS_ORACLE)
def a6_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: explicit GROUPING SETS — the general form rollup/cube sugar
    over; one Expand + one hash aggregate, no self-union of per-set scans."""
    li = load_table(spark, sf_dir, "orders")
    return (
        li.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            # exact money sum (r9 sf1-gate hardening): e2-quantized BIGINT
            (
                F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
                .cast("double")
                / 100.0
            ).alias("total"),
        )
        .select("gid", "o_orderstatus", "o_orderpriority", "n", "total")
    )


A6_DISTINCT_ORACLE = """
SELECT l_returnflag,
       count(DISTINCT l_orderkey) AS n_orders,
       count(DISTINCT l_partkey)  AS n_parts,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


@register("a6_distinct_agg", A6_DISTINCT_ORACLE)
def a6_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: multi-column exact distinct aggregation (expand + two-phase agg
    under the hood)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


A6_PERCENTILES_ORACLE = """
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
       round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price,
       round(stddev_pop(l_discount), 6) AS sd_disc,
       round(min(l_extendedprice), 2) AS min_price,
       round(max(l_extendedprice), 2) AS max_price
FROM lineitem GROUP BY l_returnflag
"""


@register("a6_percentiles", A6_PERCENTILES_ORACLE)
def a6_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: distribution statistics — exact interpolated percentiles
    (median/p95), population stddev, min/max. Exact percentile sorts
    within the aggregate; the 100 TB default is ``approx_percentile``
    (t-digest sketch, mergeable map-side) unless exactness is contractual
    — same trade as exact vs approx distinct."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("median_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.95)), 4).alias("p95_price"),
        F.round(F.stddev_pop("l_discount"), 6).alias("sd_disc"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@register("a6_approx_percentiles")  # rows-only: t-digest sketch estimates
def a6_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 scale path for a6_percentiles: approx_percentile's t-digest
    sketch merges map-side (mergeable summaries — no per-group sort), the
    default at 100 TB. Bounded error vs the exact percentile is asserted
    in tests/test_relational_sketches.py."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_quantity", F.lit(0.5), F.lit(10000)).alias("median_qty"),
        F.approx_percentile("l_extendedprice", F.lit(0.95), F.lit(10000)).alias("p95_price"),
    )


A6_WINSORIZED_ORACLE = """
WITH thr AS (
  SELECT quantile_cont(l_extendedprice, 0.05) AS lo,
         quantile_cont(l_extendedprice, 0.95) AS hi
  FROM lineitem
)
SELECT l_returnflag,
       count(*) AS n_rows,
       CAST(sum(CASE WHEN l_extendedprice < thr.lo
                       OR l_extendedprice > thr.hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped,
       round(avg(greatest(thr.lo, least(thr.hi, l_extendedprice))), 2)
         AS winsorized_avg,
       round(avg(l_extendedprice), 2) AS raw_avg
FROM lineitem, thr
GROUP BY l_returnflag
"""


@register("a6_winsorized_stats", A6_WINSORIZED_ORACLE)
def a6_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: winsorized (p05/p95-clipped) means next to raw means — the
    outlier-robust summary a feature pipeline ships instead of trusting
    tail-sensitive averages. The clip thresholds are a 1-row exact
    percentile aggregate broadcast back as a cross join (the
    ``tp_mixture_weights`` scalar shape); clipping itself is a map-side
    least/greatest. At 100 TB the thresholds come from
    ``approx_percentile`` (mergeable t-digest) with the identical plan.
    Both engines interpolate percentiles the same way and the clipped
    averages are rounded to 2 on both sides."""
    li = load_table(spark, sf_dir, "lineitem")
    thr = li.agg(
        F.percentile("l_extendedprice", F.lit(0.05)).alias("lo"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("hi"),
    )
    price = F.col("l_extendedprice")
    clipped = F.greatest(F.col("lo"), F.least(F.col("hi"), price))
    return (
        li.crossJoin(F.broadcast(thr))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(((price < F.col("lo")) | (price > F.col("hi"))).cast("long"))
            .alias("n_clipped"),
            F.round(F.avg(clipped), 2).alias("winsorized_avg"),
            F.round(F.avg(price), 2).alias("raw_avg"),
        )
    )


@register("a6_freq_items")  # rows-only: heavy-hitter sketch is impl-specific
def a6_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: heavy hitters via freqItems (a one-pass streaming-summary
    sketch) over order priority and status — the shape that finds hot keys
    BEFORE a join, to decide what to salt (SCALE.md joins section).
    Superset guarantee (may over-report, never under-) asserted in
    tests/test_relational_sketches.py."""
    o = load_table(spark, sf_dir, "orders")
    freq = o.stat.freqItems(["o_orderpriority", "o_orderstatus"], support=0.2)
    return freq.select(
        F.array_sort("o_orderpriority_freqItems").alias("hot_priorities"),
        F.array_sort("o_orderstatus_freqItems").alias("hot_statuses"),
    )


@register("a6_approx_distinct")  # rows-only: HLL sketches are impl-specific
def a6_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: approx_count_distinct (HyperLogLog++) — the 100 TB path where
    exact distinct would shuffle every key. No oracle: sketch estimates are
    implementation-defined; correctness is bounded-error, asserted in
    tests/test_relational.py against the exact count."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
    )


# ---------------------------------------------------------------------------
# F14 scalar-function sweep
# ---------------------------------------------------------------------------

F14_ORACLE = """
SELECT p_partkey,
       CAST(floor(abs(p_retailprice - 1000.0) * 100) AS BIGINT) AS abs_diff_cents,
       round(sqrt(CAST(p_size AS DOUBLE)), 6) AS size_sqrt,
       round(ln(CAST(p_size AS DOUBLE) + 1.0), 6) AS size_ln,
       CAST(p_size AS BIGINT) * CAST(p_size AS BIGINT) AS size_sq,
       upper(p_brand) AS brand_upper,
       substr(p_name, 1, 5) AS name_prefix,
       length(p_name) AS name_len,
       string_split(p_type, ' ')[1] AS type_head,
       replace(p_brand, '#', '-') AS brand_norm,
       greatest(p_size, 10) AS size_floor10,
       CASE WHEN p_retailprice > 1500 THEN 'high' ELSE 'low' END AS price_band
FROM part
"""


@register("f14_scalar_sweep", F14_ORACLE)
def f14_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14: math / string / array / conditional scalar surface — all
    JVM-side codegen'd Column expressions (SURVEY.md §2.6), no Python."""
    p = load_table(spark, sf_dir, "part")
    size_d = F.col("p_size").cast("double")
    return p.select(
        "p_partkey",
        F.floor(F.abs(F.col("p_retailprice") - 1000.0) * 100).alias("abs_diff_cents"),
        F.round(F.sqrt(size_d), 6).alias("size_sqrt"),
        F.round(F.log(size_d + 1.0), 6).alias("size_ln"),
        (F.col("p_size").cast("long") * F.col("p_size").cast("long")).alias("size_sq"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.element_at(F.split("p_type", " "), 1).alias("type_head"),
        F.regexp_replace("p_brand", "#", "-").alias("brand_norm"),
        F.greatest("p_size", F.lit(10)).alias("size_floor10"),
        F.when(F.col("p_retailprice") > 1500, "high").otherwise("low").alias("price_band"),
    )


# ---------------------------------------------------------------------------
# F12/F14 JSON extraction (the reference round-trips JSON constantly)
# ---------------------------------------------------------------------------

JSON_ORACLE = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(*) AS n
FROM events
GROUP BY event_type
"""


@register("json_props_extract", JSON_ORACLE)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 (publish_to_catalog.py:52, 346, 581): JSON decode as a column
    op — get_json_object stays JVM-side, no Python json.loads per row."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# A6 pivot (engine-portable CASE formulation)
# ---------------------------------------------------------------------------

PIVOT_ORACLE = """
SELECT l_returnflag,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2) AS qty_O,
       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2) AS qty_F,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


@register("a6_pivot", PIVOT_ORACLE)
def a6_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot via the native .pivot() operator with explicit value list (no
    extra pass to discover values — required at scale) — the oracle is the
    equivalent conditional aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(
            F.round(F.sum(F.coalesce(F.col("l_quantity"), F.lit(0.0))), 2).alias("qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    return wide.select(
        "l_returnflag",
        F.coalesce(F.col("O_qty"), F.lit(0.0)).alias("qty_O"),
        F.coalesce(F.col("F_qty"), F.lit(0.0)).alias("qty_F"),
        (F.coalesce(F.col("O_cnt"), F.lit(0)) + F.coalesce(F.col("F_cnt"), F.lit(0))).alias("n"),
    )


# ---------------------------------------------------------------------------
# F9 date/time scalar surface
# ---------------------------------------------------------------------------

F9_ORACLE = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(month(o_orderdate) AS INT) AS mo,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       CAST(dayofweek(o_orderdate) AS INT) AS dow,
       strftime(o_orderdate, '%Y-%m-%d') AS iso_date,
       CAST(floor(epoch(date_trunc('month', o_orderdate))) AS BIGINT) AS month_start_epoch,
       date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS days_to_cutoff
FROM orders
"""


@register("f9_date_functions", F9_ORACLE)
def f9_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 (publish_to_catalog.py:453, 576): the timestamp-formatting /
    calendar surface the reference builds with strftime, as Column ops.
    DOW convention aligned to DuckDB (0=Sunday): Spark dayofweek is
    1=Sunday, so shift by -1."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.quarter("o_orderdate").alias("qtr"),
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_date"),
        F.unix_timestamp(F.date_trunc("month", F.col("o_orderdate"))).alias(
            "month_start_epoch"
        ),
        F.datediff(F.lit("2002-01-01").cast("timestamp"), F.col("o_orderdate"))
        .cast("long")
        .alias("days_to_cutoff"),
    )


# ---------------------------------------------------------------------------
# P12 null-safe field coalescing
# ---------------------------------------------------------------------------

P12_ORACLE = """
WITH sparse AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_name END AS maybe_name,
         CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_mktsegment END AS maybe_seg
  FROM customer
)
SELECT c_custkey,
       coalesce(maybe_name, '') AS name_filled,
       coalesce(maybe_seg, 'UNKNOWN') AS seg_filled,
       (maybe_name IS NULL) AS name_was_missing
FROM sparse
"""


@register("p12_null_safe_getter", P12_ORACLE)
def p12_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12 (``getMetadataFieldIfExists``, publish_to_catalog.py:370-373):
    field-if-present-else-default, null-safe across the row."""
    c = load_table(spark, sf_dir, "customer")
    sparse = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 3 == 0, F.lit(None)).otherwise(F.col("c_name")).alias("maybe_name"),
        F.when(F.col("c_custkey") % 5 == 0, F.lit(None)).otherwise(F.col("c_mktsegment")).alias("maybe_seg"),
    )
    return sparse.select(
        "c_custkey",
        F.coalesce(F.col("maybe_name"), F.lit("")).alias("name_filled"),
        F.coalesce(F.col("maybe_seg"), F.lit("UNKNOWN")).alias("seg_filled"),
        F.col("maybe_name").isNull().alias("name_was_missing"),
    )


# ---------------------------------------------------------------------------
# UDF surface: Arrow grouped-map (applyInPandas) with SQL-checkable output
# ---------------------------------------------------------------------------

ZSCORE_ORACLE = """
WITH stats AS (
  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
         avg(l_extendedprice) OVER (PARTITION BY l_returnflag) AS mu,
         stddev_pop(l_extendedprice) OVER (PARTITION BY l_returnflag) AS sigma
  FROM lineitem
)
SELECT l_returnflag, l_orderkey, l_linenumber,
       round((l_extendedprice - mu) / sigma, 4) AS price_z
FROM stats
"""


@register("udf_grouped_zscore", ZSCORE_ORACLE)
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow grouped-map path (SURVEY.md §2.8): per-group normalization
    via applyInPandas — each group arrives as ONE pandas DataFrame, so this
    is the template for any per-group Python logic Spark lacks. The oracle
    reproduces it with window aggregates, proving the UDF path
    bit-compatible with the declarative one (population stddev, matching
    numpy's default ddof=0).

    Scale note: grouped-map shuffles once on the group key and requires
    each GROUP to fit in executor memory — fine for bounded groups
    (3 return flags here means 3 fat groups; real deployments key by
    something finer). Where expressible, prefer the window formulation —
    this query exists to keep the UDF plumbing honest."""
    import pandas as pd  # noqa: PLC0415

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["l_extendedprice"].mean()
        sigma = pdf["l_extendedprice"].std(ddof=0)
        return pd.DataFrame(
            {
                "l_returnflag": pdf["l_returnflag"],
                "l_orderkey": pdf["l_orderkey"],
                "l_linenumber": pdf["l_linenumber"],
                "price_z": ((pdf["l_extendedprice"] - mu) / sigma).round(4),
            }
        )

    return li.groupBy("l_returnflag").applyInPandas(
        zscore,
        schema="l_returnflag string, l_orderkey long, l_linenumber int, price_z double",
    )


# ---------------------------------------------------------------------------
# F14 higher-order array ops (transform / filter / aggregate / zip)
# ---------------------------------------------------------------------------

ARRAY_HOF_ORACLE = r"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
)
SELECT doc_id,
       len(toks) AS n_toks,
       CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS BIGINT) AS total_chars,
       len(list_filter(toks, x -> length(x) > 4)) AS n_long,
       list_aggregate(list_transform(toks, x -> length(x)), 'max') AS max_len,
       array_to_string(list_sort(list_distinct(list_transform(toks, x -> substr(x, 1, 1)))), '') AS initials
FROM t
"""


@register("f14_array_higher_order", ARRAY_HOF_ORACLE)
def f14_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14 higher-order surface: transform/filter/aggregate/sort/distinct
    over array columns — all codegen'd, the idiom that replaces per-row
    Python loops for nested data."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    lens = F.transform(toks, lambda x: F.length(x))
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_toks"),
        F.aggregate(lens, F.lit(0).cast("long"), lambda a, x: a + x).alias("total_chars"),
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).cast("long").alias("n_long"),
        F.array_max(lens).alias("max_len"),
        F.array_join(
            F.array_sort(F.array_distinct(F.transform(toks, lambda x: F.substring(x, 1, 1)))),
            "",
        ).alias("initials"),
    )


# ---------------------------------------------------------------------------
# W2b distribution ranks + RANGE-frame windows
# ---------------------------------------------------------------------------

W2B_ORACLE = """
SELECT o_orderkey,
       ntile(4) OVER wp AS price_quartile,
       round(percent_rank() OVER wp, 4) AS pr,
       round(cume_dist() OVER wp, 4) AS cd,
       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
              OVER (PARTITION BY o_custkey
                    ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT)
                    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS trailing_30d_cents
FROM orders
WINDOW wp AS (PARTITION BY o_custkey
              ORDER BY CAST(floor(o_totalprice * 100) AS BIGINT) DESC, o_orderkey ASC)
"""


@register("w2b_distribution_ranks", W2B_ORACLE)
def w2b_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 completion: distribution ranks (ntile/percent_rank/cume_dist,
    with a unique tiebreak so quartile edges are deterministic) plus a
    time-RANGE frame — the trailing-30-day spend, which unlike a ROWS
    frame includes ALL rows in the value range regardless of tie order.
    Both windows share the o_custkey partition: one shuffle, two sorts."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    wp = Window.partitionBy("o_custkey").orderBy(cents.desc(), F.col("o_orderkey").asc())
    wr = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-2592000, 0)
    )
    return o.select(
        "o_orderkey",
        F.ntile(4).over(wp).alias("price_quartile"),
        F.round(F.percent_rank().over(wp), 4).alias("pr"),
        F.round(F.cume_dist().over(wp), 4).alias("cd"),
        F.sum(cents).over(wr).alias("trailing_30d_cents"),
    )


# ---------------------------------------------------------------------------
# A6 equi-depth binning (quantile buckets as first-class output)
# ---------------------------------------------------------------------------

EQUIDEPTH_ORACLE = """
WITH t AS (
  SELECT ntile(8) OVER (ORDER BY CAST(floor(o_totalprice * 100) AS BIGINT) ASC,
                                 o_orderkey ASC) AS bin,
         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT bin, count(*) AS n, min(cents) AS lo, max(cents) AS hi
FROM t GROUP BY bin
"""


@register("a6_equidepth_bins", EQUIDEPTH_ORACLE)
def a6_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: equi-depth histogram — 8 equal-count price bins with their
    boundaries (the stats a cost-based optimizer or range partitioner
    derives). Deterministic tiebreak on orderkey pins bucket edges.

    Scale posture: ntile over a global ORDER BY is a range-partitioned
    sort (Spark samples boundaries, no single-partition collapse is
    REQUIRED — but Window.orderBy() without partitionBy does funnel into
    one partition; at 100 TB use approx_percentile boundaries + a map-side
    width_bucket instead, trading exact equal counts for a fully parallel
    plan (same trade as a6_percentiles → a6_approx_percentiles)."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    w = Window.orderBy(cents.asc(), F.col("o_orderkey").asc())
    return (
        o.select(cents.alias("cents"), F.ntile(8).over(w).alias("bin"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("cents").alias("lo"),
            F.max("cents").alias("hi"),
        )
    )


@register("a6_width_bucket_bins")  # rows-only: boundaries come from a sketch
def a6_width_bucket_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB path for `a6_equidepth_bins`: approx_percentile computes
    the 8 boundary values as a mergeable sketch (no global sort, no
    single-partition window), then every row assigns its bin MAP-SIDE by
    counting boundaries below it (higher-order filter over the broadcast
    1-row bounds array). Fully parallel at any scale; bin counts are
    approximately equal rather than exactly equal — the standard trade."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    bounds = o.agg(
        F.approx_percentile(
            cents, F.array(*[F.lit(i / 8.0) for i in range(1, 8)]), F.lit(10000)
        ).alias("bs")
    )
    binned = o.select(cents.alias("cents")).join(F.broadcast(bounds)).select(
        "cents",
        (F.size(F.filter(F.col("bs"), lambda b: F.col("cents") > b)) + 1).alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
    )


# ---------------------------------------------------------------------------
# DQ referential-integrity audit (orphan foreign keys via anti joins)
# ---------------------------------------------------------------------------

RI_ORACLE = """
SELECT 'lineitem.l_orderkey->orders' AS fk,
       (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS n_orphans
UNION ALL
SELECT 'lineitem.l_partkey->part',
       (SELECT count(*) FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part))
UNION ALL
SELECT 'orders.o_custkey->customer',
       (SELECT count(*) FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
UNION ALL
SELECT 'customer.c_nationkey->nation',
       (SELECT count(*) FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation))
"""


@register("dq_referential_integrity", RI_ORACLE)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit: orphan-FK counts across the four fact→dim
    relationships, each a LEFT ANTI join (build side = the referenced key
    set only). The ETL-gate cousin of the reference's per-row validation
    (SURVEY.md §2.2) lifted to cross-table invariants.

    Scale posture: each anti join broadcasts the dim-key hash set where
    the dim is small and sort-merges otherwise; the four audits share no
    state, so AQE runs them as independent parallel stages in one job."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    def orphans(fact: DataFrame, fk: str, dim: DataFrame, pk: str, label: str) -> DataFrame:
        return (
            fact.select(F.col(fk))
            .join(dim.select(F.col(pk)), fact[fk] == dim[pk], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(label).alias("fk"), "n_orphans")
        )

    return (
        orphans(li, "l_orderkey", o, "o_orderkey", "lineitem.l_orderkey->orders")
        .unionByName(
            orphans(
                li, "l_partkey", load_table(spark, sf_dir, "part"), "p_partkey",
                "lineitem.l_partkey->part",
            )
        )
        .unionByName(orphans(o, "o_custkey", c, "c_custkey", "orders.o_custkey->customer"))
        .unionByName(
            orphans(
                c, "c_nationkey", load_table(spark, sf_dir, "nation"), "n_nationkey",
                "customer.c_nationkey->nation",
            )
        )
    )


# ---------------------------------------------------------------------------
# F12b VARIANT semi-structured surface (Spark 4 parse_json / variant_get)
# ---------------------------------------------------------------------------

VARIANT_ORACLE = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       count(*) AS n
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
GROUP BY event_type
"""


@register("f12b_variant_extract", VARIANT_ORACLE)
def f12b_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 modern form: semi-structured access through the VARIANT type
    (parse_json once → try_variant_get paths) instead of per-path string
    re-parsing with get_json_object. At 100 TB, store the column AS
    variant in parquet: parse cost is paid at ingest, every read is a
    binary-encoded path lookup — the Spark-4 answer to the reference's
    json.loads-per-row (publish_to_catalog.py:52, 346)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# F15 error-safe scalar surface (try_* family — ANSI mode without the traps)
# ---------------------------------------------------------------------------

F15_ORACLE = """
SELECT p_partkey,
       TRY_CAST(p_name AS DOUBLE) AS name_as_num,
       CASE WHEN p_size - 5 = 0 THEN NULL
            ELSE round(p_retailprice / (p_size - 5), 4) END AS per_size_price,
       string_split(p_type, ' ')[3] AS type_third,
       TRY_CAST(substr(p_name, 1, 3) AS BIGINT) AS prefix_num
FROM part
"""


@register("f15_try_functions", F15_ORACLE)
def f15_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15: the error-safe scalar family — Spark 4 runs ANSI mode by
    default, where a single malformed cell KILLS the job unless the
    expression is written with try_* (try_cast / try_divide /
    try_element_at → NULL instead of raise). This is the contract every
    ingest expression in this repo follows (the driver's plain session
    is ANSI-mode), swept here end-to-end."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_name").try_cast("double").alias("name_as_num"),
        F.round(
            F.try_divide(F.col("p_retailprice"), F.col("p_size") - 5), 4
        ).alias("per_size_price"),
        F.try_element_at(F.split("p_type", " "), F.lit(3)).alias("type_third"),
        F.substring("p_name", 1, 3).try_cast("bigint").alias("prefix_num"),
    )


# ---------------------------------------------------------------------------
# W2c windows OVER aggregates: MoM growth + share-of-year
# ---------------------------------------------------------------------------

TREND_ORACLE = """
WITH monthly AS (
  SELECT CAST(year(o_orderdate) AS INT) AS yr,
         CAST(month(o_orderdate) AS INT) AS mo,
         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders GROUP BY yr, mo
)
SELECT yr, mo, rev_cents,
       round(100.0 * (rev_cents - lag(rev_cents) OVER w)
             / lag(rev_cents) OVER w, 4) AS mom_pct,
       round(CAST(rev_cents AS DOUBLE)
             / sum(rev_cents) OVER (PARTITION BY yr), 6) AS share_of_year
FROM monthly
WINDOW w AS (ORDER BY yr, mo)
"""


@register("trend_monthly_growth", TREND_ORACLE)
def trend_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windows OVER an aggregate (the reporting staple): monthly revenue →
    month-over-month growth (lag across the whole series) + share-of-year
    (partitioned total). Integer cents before aggregation so the series
    is FP-exact cross-engine.

    Scale posture: the aggregate reduces the fact table to |months| rows
    FIRST; the unpartitioned lag window then runs over dozens of rows —
    single-partition windows are only a smell when they see raw-data
    cardinality (cf. a6_equidepth_bins' scale note)."""
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.month("o_orderdate").cast("int").alias("mo"),
        )
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("rev_cents"))
    )
    w = Window.orderBy("yr", "mo")
    wy = Window.partitionBy("yr")
    prev = F.lag("rev_cents").over(w)
    return monthly.select(
        "yr",
        "mo",
        "rev_cents",
        F.round(100.0 * (F.col("rev_cents") - prev) / prev, 4).alias("mom_pct"),
        F.round(
            F.col("rev_cents").cast("double") / F.sum("rev_cents").over(wy), 6
        ).alias("share_of_year"),
    )


# ---------------------------------------------------------------------------
# SQL-API surface: the same engine through spark.sql
# ---------------------------------------------------------------------------

@register("sql_api_pricing_summary", Q1_ORACLE)
def sql_api_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 expressed through the SQL API (temp view + spark.sql) instead of
    the DataFrame DSL — identical logical plan, identical oracle. Exists
    to pin that the engine's SQL surface is first-class: a reference user
    who writes SQL, not DataFrames, gets the same Catalyst plan (the
    DataFrame DSL and SQL parse to the same logical operators)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("sql_api_lineitem")
    # shares Q1_ORACLE, so the SQL must carry Q1's exact-money-sum
    # quantization verbatim (only the table name differs)
    return spark.sql(Q1_ORACLE.replace("FROM lineitem", "FROM sql_api_lineitem"))


# ---------------------------------------------------------------------------
# DQ: order-insensitive partition checksums (cross-system sync verification)
# ---------------------------------------------------------------------------

from ntd_gtfs_to_socrata_spark.operators import textops as _TX

_CK_MOD = 1_000_000_007

DQ_CHECKSUM_ORACLE = f"""
WITH sig AS (
  SELECT o_orderkey % 32 AS bucket,
         ((((o_orderkey % {_CK_MOD}) * 1000003 + (o_custkey % {_CK_MOD})) % {_CK_MOD}
            * 1000003 + CAST(floor(o_totalprice * 100) AS BIGINT)) % {_CK_MOD}
            * 31 + {_TX.poly_hash_sql("o_orderstatus || '|' || o_orderpriority", 16)}
         ) % {_CK_MOD} AS row_sig
  FROM orders
)
SELECT bucket, count(*) AS n_rows,
       bit_xor(row_sig) AS xor_sig,
       CAST(sum(row_sig) AS BIGINT) % {_CK_MOD} AS sum_sig
FROM sig GROUP BY bucket
"""


@register("dq_partition_checksums", DQ_CHECKSUM_ORACLE)
def dq_partition_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive per-bucket checksums over a keyed table: row →
    engine-portable signature (chained modular polynomial over the numeric
    fields + char_poly_hash of the string fields), bucket → (count,
    XOR-fold, modular sum). Two tables on two systems (the reference's
    Socrata copy vs the lake copy, publish_to_catalog.py's implicit sync
    assumption) match iff every bucket row matches — comparing 32 rows
    instead of re-shipping the table. THIS query hash-matching DuckDB is
    itself the cross-engine demo.

    Scale posture: map-only signature + one partial-aggregated shuffle of
    |buckets| rows; both fold functions (XOR, modular sum) are commutative
    monoids, so partition order and AQE coalescing cannot change the
    result. A production deployment widens to xxhash64 signatures — same
    plan, engine-specific hash."""
    o = load_table(spark, sf_dir, "orders")
    mod = F.lit(_CK_MOD)
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    poly = _TX.char_poly_hash(
        F.concat_ws("|", F.col("o_orderstatus"), F.col("o_orderpriority")), 16
    )
    h1 = (F.col("o_orderkey") % mod) * 1000003 + (F.col("o_custkey") % mod)
    h2 = (h1 % mod) * 1000003 + cents
    row_sig = ((h2 % mod) * 31 + poly) % mod
    return (
        o.select((F.col("o_orderkey") % 32).alias("bucket"), row_sig.alias("row_sig"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor("row_sig").alias("xor_sig"),
            (F.sum("row_sig") % mod).alias("sum_sig"),
        )
    )


# ---------------------------------------------------------------------------
# DQ: join-key skew profile (the pre-flight check before choosing a join
# strategy / salting factor)
# ---------------------------------------------------------------------------

DQ_SKEW_ORACLE = """
WITH per_key AS (
  SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey
)
SELECT count(*) AS n_keys,
       CAST(max(n) AS BIGINT) AS max_per_key,
       round(avg(n), 2) AS avg_per_key,
       round(quantile_cont(n, 0.50), 2) AS p50_per_key,
       round(quantile_cont(n, 0.99), 2) AS p99_per_key,
       round(max(n) / avg(n), 2) AS skew_ratio
FROM per_key
"""


@register("dq_join_key_skew", DQ_SKEW_ORACLE)
def dq_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Occupancy profile of a join key (orders per custkey): key count,
    max/avg/median/p99 rows per key, and the max/avg skew ratio that
    decides the join strategy at 100 TB — ratio ≈ 1 → plain shuffle
    join; heavy tail → AQE skew-join split; a few catastrophic keys →
    the j6_salted_skew_join treatment. Two map-side-combined
    aggregations (corpus → per-key counts → 1-row profile); the exact
    percentiles run over the KEY table (bounded by key cardinality),
    where a billion-key profile would switch to approx_percentile with
    the same plan shape."""
    per_key = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_per_key"),
        F.round(F.avg("n"), 2).alias("avg_per_key"),
        F.round(F.percentile("n", F.lit(0.50)), 2).alias("p50_per_key"),
        F.round(F.percentile("n", F.lit(0.99)), 2).alias("p99_per_key"),
        F.round(F.max("n") / F.avg("n"), 2).alias("skew_ratio"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters (deterministic hash family → full oracle)
# ---------------------------------------------------------------------------

_CMS_PRIMES = (1000003, 999983, 777767, 65539)  # one row of the sketch each
_CMS_W = 256

CMS_ORACLE = f"""
WITH ks AS (SELECT l_partkey AS k FROM lineitem),
hf(d, p) AS (VALUES {", ".join(f"({d}, {p})" for d, p in enumerate(_CMS_PRIMES))}),
h AS (SELECT k, d, ((k % {_CK_MOD}) * p) % {_CK_MOD} % {_CMS_W} AS bucket FROM ks, hf),
counters AS (SELECT d, bucket, count(*) AS n FROM h GROUP BY d, bucket),
topk AS (
  SELECT k, count(*) AS exact_n FROM ks GROUP BY k
  ORDER BY exact_n DESC, k ASC LIMIT 20
),
probes AS (
  SELECT k, exact_n, d, ((k % {_CK_MOD}) * p) % {_CK_MOD} % {_CMS_W} AS bucket
  FROM topk, hf
),
est AS (
  SELECT k, exact_n, min(n) AS est_n
  FROM probes JOIN counters USING (d, bucket) GROUP BY k, exact_n
)
SELECT k AS partkey, exact_n, est_n, est_n >= exact_n AS never_under FROM est
"""


@register("a6_count_min_heavy_hitters", CMS_ORACLE)
def a6_count_min_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch: d={d} hash rows x w={w} buckets of COUNTS replace a
    full per-key frequency table; any key's frequency is read back as
    min over rows of its bucket counter — never an underestimate, biased
    high by collisions (the CMS guarantee, asserted per-key in the
    `never_under` column and in tests). The hash family is a deterministic
    modular-multiply, so unlike `a6_approx_distinct` (HLL, impl-specific)
    the ENTIRE sketch is replayed by the DuckDB oracle and value-hash
    checked.

    Scale posture: the sketch build is explode(d) → partial-aggregated
    shuffle of at most d·w counter rows — constant-size state however large
    the stream (the same reason CMS works in a streaming `foreachBatch`
    accumulator); probes join the d·w counter table BROADCAST. The exact
    top-20 here exists only to ground-truth the estimates; production reads
    candidates from the sketch alone."""
    li = load_table(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("k"))
    mod = F.lit(_CK_MOD)
    buckets = F.array(
        *[(((F.col("k") % mod) * p) % mod) % _CMS_W for p in _CMS_PRIMES]
    )
    counters = (
        li.select(F.posexplode(buckets).alias("d", "bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    topk = (
        li.groupBy("k")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("k").asc())
        .limit(20)
    )
    probes = topk.select("k", "exact_n", F.posexplode(buckets).alias("d", "bucket"))
    est = (
        probes.join(F.broadcast(counters), ["d", "bucket"])
        .groupBy("k", "exact_n")
        .agg(F.min("n").alias("est_n"))
    )
    return est.select(
        F.col("k").alias("partkey"),
        "exact_n",
        "est_n",
        (F.col("est_n") >= F.col("exact_n")).alias("never_under"),
    )


a6_count_min_heavy_hitters.__doc__ = a6_count_min_heavy_hitters.__doc__.format(
    d=len(_CMS_PRIMES), w=_CMS_W
)


# ---------------------------------------------------------------------------
# Join-cardinality pre-flight (the other half of dq_join_key_skew)
# ---------------------------------------------------------------------------

JOIN_CARD_ORACLE = """
WITH a AS (
  SELECT o_custkey AS k, count(*) AS na FROM orders GROUP BY o_custkey
),
b AS (
  SELECT c_custkey AS k, count(*) AS nb FROM customer GROUP BY c_custkey
),
m AS (SELECT a.k, a.na, b.nb FROM a JOIN b ON a.k = b.k)
SELECT CAST(sum(na * nb) AS BIGINT) AS est_output_rows,
       CAST(count(*) AS BIGINT) AS n_matching_keys,
       CAST(max(na * nb) AS BIGINT) AS max_key_fanout,
       round(CAST(sum(na * nb) AS DOUBLE) / count(*), 2) AS avg_key_fanout,
       CAST((SELECT count(*) FROM a) AS BIGINT) AS n_keys_left,
       CAST((SELECT count(*) FROM b) AS BIGINT) AS n_keys_right
FROM m
"""


@register("dq_join_cardinality_estimate", JOIN_CARD_ORACLE)
def dq_join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight join sizing: the EXACT output cardinality of
    orders⋈customer on custkey computed WITHOUT materializing the join —
    Σ over matching keys of na·nb, plus the max single-key fan-out (the
    row a skew split would target). With `dq_join_key_skew` this is the
    planner's pre-flight pair: skew says HOW the shuffle hurts, this says
    HOW BIG the output is — run both before committing a fact⋈fact join
    at 100 TB.

    Scale posture: two map-side-combined key aggregations (each shuffles
    one row per distinct key, not per input row) + one key-sized FULL
    OUTER join + a 1-row fold that reads every output column from that
    single joined frame (matching keys where both sides present, per-side
    key counts as count(na)/count(nb)). The estimate is exact for
    equi-joins because join output per key IS na·nb — no sampling, no
    sketch, no join executed. r7 note: the earlier form computed the
    per-side key-count scalars from SEPARATE re-listings of the key aggs,
    and the claimed AQE exchange reuse was measured NOT to materialize
    (7 executed shuffles, tools/measure_exchanges.py) — the one-pass
    full-outer form executes each key agg exactly once (4) by
    construction."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    a = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("na")
    )
    b = cust.groupBy(F.col("c_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("nb")
    )
    m = a.join(b, "k", "full_outer").select(
        "na", "nb", (F.col("na") * F.col("nb")).alias("f")
    )
    return m.agg(
        F.sum("f").cast("long").alias("est_output_rows"),
        F.count("f").cast("long").alias("n_matching_keys"),
        F.max("f").cast("long").alias("max_key_fanout"),
        F.round(F.sum("f").cast("double") / F.count("f"), 2).alias(
            "avg_key_fanout"
        ),
        F.count("na").cast("long").alias("n_keys_left"),
        F.count("nb").cast("long").alias("n_keys_right"),
    )


# ---------------------------------------------------------------------------
# Column null/blank profile (the first DQ scan on any new table)
# ---------------------------------------------------------------------------

NULL_PROFILE_ORACLE = """
SELECT 'event_type' AS col,
       count(*) AS n_rows,
       CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(sum(CASE WHEN trim(coalesce(event_type, '')) = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_blank,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_distinct
FROM events
UNION ALL
SELECT 'props', count(*),
       CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN trim(coalesce(props, '')) = '' THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT props) AS BIGINT)
FROM events
UNION ALL
SELECT 'value', count(*),
       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(0 AS BIGINT),
       CAST(count(DISTINCT value) AS BIGINT)
FROM events
"""


@register("dq_null_profile", NULL_PROFILE_ORACLE)
def dq_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column null/blank/distinct profile — the first scan run on any
    newly-landed table. ONE pass computes every column's counters as
    parallel aggregate expressions (never one scan per column); the
    per-column rows are unpivoted from the single aggregate row with
    ``stack``, so adding a column adds an expression, not a scan.

    Scale posture: one map-side-combined aggregation; exact
    count_distinct swaps for approx_count_distinct at 100 TB
    (a6_approx_distinct is the template)."""
    ev = load_table(spark, sf_dir, "events")
    one = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("event_type").isNull().cast("int")).cast("long").alias("et_null"),
        F.sum(
            (F.trim(F.coalesce(F.col("event_type"), F.lit(""))) == "").cast("int")
        ).cast("long").alias("et_blank"),
        F.count_distinct("event_type").cast("long").alias("et_distinct"),
        F.sum(F.col("props").isNull().cast("int")).cast("long").alias("pr_null"),
        F.sum(
            (F.trim(F.coalesce(F.col("props"), F.lit(""))) == "").cast("int")
        ).cast("long").alias("pr_blank"),
        F.count_distinct("props").cast("long").alias("pr_distinct"),
        F.sum(F.col("value").isNull().cast("int")).cast("long").alias("va_null"),
        F.count_distinct("value").cast("long").alias("va_distinct"),
    )
    return one.selectExpr(
        """stack(3,
             'event_type', n_rows, et_null, et_blank, et_distinct,
             'props',      n_rows, pr_null, pr_blank, pr_distinct,
             'value',      n_rows, va_null, CAST(0 AS BIGINT), va_distinct
           ) AS (col, n_rows, n_null, n_blank, n_distinct)"""
    )


# ---------------------------------------------------------------------------
# Benford first-digit screen (fraud/synthetic-data detector)
# ---------------------------------------------------------------------------

BENFORD_ORACLE = """
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT)
           AS first_digit
  FROM orders WHERE o_totalprice >= 1
),
counts AS (
  SELECT first_digit, count(*) AS n FROM digits GROUP BY first_digit
),
tot AS (SELECT sum(n) AS total FROM counts)
SELECT c.first_digit, c.n,
       round(CAST(c.n AS DOUBLE) / t.total, 4) AS observed_p,
       round(log10(1.0 + 1.0 / c.first_digit), 4) AS benford_p,
       CAST(floor(abs(CAST(c.n AS DOUBLE) / t.total
                 - log10(1.0 + 1.0 / c.first_digit)) * 10000) AS BIGINT) AS abs_dev_bp
FROM counts c CROSS JOIN tot t
"""


@register("dq_benford_first_digit", BENFORD_ORACLE)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over order totals — the classic
    tamper/synthetic-data detector: natural multi-magnitude amounts
    follow P(d) = log10(1 + 1/d); a flat or spiked observed distribution
    flags generated or manipulated values. Reports per-digit observed vs
    expected probability and the absolute deviation (the χ²/MAD fold is
    one more 1-row aggregate the caller owns).

    The first digit comes from the INTEGER rendering (explicit floor,
    then BIGINT, then string) — a bare double→BIGINT cast TRUNCATES in
    Spark but ROUNDS in DuckDB, and float-to-string formatting differs
    across engines; floor-then-int-to-string does neither.

    Scale posture: one 9-key map-side-combined aggregation + a 1-row
    total broadcast — the eval_calibration_bins shape."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digits = o.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
        ).cast("long").alias("first_digit")
    )
    counts = digits.groupBy("first_digit").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").cast("double").alias("total"))
    benford_p = F.log10(1.0 + 1.0 / F.col("first_digit"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "first_digit",
        "n",
        F.round(F.col("n") / F.col("total"), 4).alias("observed_p"),
        F.round(benford_p, 4).alias("benford_p"),
        # floor-to-basis-points, not round: the deviation lands on round()'s
        # half boundary and Spark/DuckDB disagree there (repo convention)
        F.floor(F.abs(F.col("n") / F.col("total") - benford_p) * 10000)
        .cast("long")
        .alias("abs_dev_bp"),
    )


# ---------------------------------------------------------------------------
# DQ: distribution drift between corpus snapshots (PSI)
# ---------------------------------------------------------------------------

_PSI_BINS = 10
_PSI_W = 64  # chars per bin; corpus lengths land in [0, 640)

PSI_ORACLE = f"""
WITH binned AS (
  SELECT least(CAST(floor(n_chars / {_PSI_W}) AS BIGINT), {_PSI_BINS - 1}) AS bin,
         doc_id % 2 AS cohort
  FROM documents
),
spine AS (SELECT unnest(range({_PSI_BINS})) AS bin),
a AS (SELECT bin, count(*) AS n FROM binned WHERE cohort = 0 GROUP BY bin),
b AS (SELECT bin, count(*) AS n FROM binned WHERE cohort = 1 GROUP BY bin),
tot AS (
  SELECT (SELECT count(*) FROM binned WHERE cohort = 0) AS ta,
         (SELECT count(*) FROM binned WHERE cohort = 1) AS tb
),
props AS (
  SELECT s.bin,
         coalesce(a.n, 0) AS n_a, coalesce(b.n, 0) AS n_b,
         (coalesce(a.n, 0) + 1) / (CAST(t.ta AS DOUBLE) + {_PSI_BINS}) AS pa,
         (coalesce(b.n, 0) + 1) / (CAST(t.tb AS DOUBLE) + {_PSI_BINS}) AS pb
  FROM spine s LEFT JOIN a ON s.bin = a.bin LEFT JOIN b ON s.bin = b.bin
  CROSS JOIN tot t
)
SELECT bin, n_a, n_b, round((pa - pb) * ln(pa / pb), 4) AS psi_contrib
FROM props
"""


@register("dq_psi_drift", PSI_ORACLE)
def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index between two corpus cohorts (even vs odd
    doc_id, standing in for yesterday's vs today's snapshot): Laplace-
    smoothed per-bin proportions of the document-length histogram, PSI
    contribution ``(p_a - p_b) * ln(p_a / p_b)`` per bin. The standard
    drift monitor a 100 TB ingest pipeline runs between snapshot versions
    before promoting a release — PSI > 0.25 on any feature blocks the
    promotion.

    Scale posture: ONE corpus scan per cohort membership (a single
    map-side-combinable groupBy over (bin, cohort) — the shuffle carries
    at most 2 x {_PSI_BINS} partial rows per task), joined onto a
    constant {_PSI_BINS}-row bin spine; cohort totals derive from the
    same tiny histogram, so no second scan and nothing data-sized ever
    shuffles. Smoothing guarantees log-defined proportions even for
    empty bins on either side."""
    docs = load_table(spark, sf_dir, "documents")
    binned = docs.select(
        F.least(F.floor(F.col("n_chars") / _PSI_W).cast("long"), F.lit(_PSI_BINS - 1)).alias(
            "bin"
        ),
        (F.col("doc_id") % 2).alias("cohort"),
    )
    hist = binned.groupBy("bin", "cohort").agg(F.count(F.lit(1)).alias("n"))
    a = hist.filter(F.col("cohort") == 0).select("bin", F.col("n").alias("n_a_raw"))
    b = hist.filter(F.col("cohort") == 1).select("bin", F.col("n").alias("n_b_raw"))
    tot = hist.agg(
        F.sum(F.when(F.col("cohort") == 0, F.col("n")).otherwise(F.lit(0))).alias("ta"),
        F.sum(F.when(F.col("cohort") == 1, F.col("n")).otherwise(F.lit(0))).alias("tb"),
    )
    spine = spark.range(_PSI_BINS).select(F.col("id").alias("bin"))
    props = (
        spine.join(a, "bin", "left")
        .join(b, "bin", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bin",
            F.coalesce(F.col("n_a_raw"), F.lit(0)).alias("n_a"),
            F.coalesce(F.col("n_b_raw"), F.lit(0)).alias("n_b"),
            ((F.coalesce(F.col("n_a_raw"), F.lit(0)) + 1) / (F.col("ta").cast("double") + _PSI_BINS)).alias("pa"),
            ((F.coalesce(F.col("n_b_raw"), F.lit(0)) + 1) / (F.col("tb").cast("double") + _PSI_BINS)).alias("pb"),
        )
    )
    return props.select(
        "bin",
        "n_a",
        "n_b",
        F.round((F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb")), 4).alias(
            "psi_contrib"
        ),
    )
