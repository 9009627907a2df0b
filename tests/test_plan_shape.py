"""Physical-plan shape assertions — the 100 TB posture, checked.

Correctness tests prove the operators compute the right answer; these prove
the plans are the ones you'd want on a 1000-executor cluster: filters and
projections reach the parquet scan, small dimensions broadcast instead of
shuffling the fact table, expressions stay inside whole-stage codegen, and
AQE wraps every exchange-bearing plan.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.io import load_table
from ntd_gtfs_to_socrata_spark.queries.relational import q1_pricing, q5_region


def plan_text(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_filter_and_projection_reach_parquet_scan(spark, sf_dir):
    """Predicate pushdown + column pruning (SURVEY.md §4): the scan must
    carry PushedFilters and read ONLY the projected columns."""
    li = load_table(spark, sf_dir, "lineitem")
    df = li.filter(F.col("l_quantity") < 10).select("l_orderkey", "l_quantity")
    plan = plan_text(df)
    assert "PushedFilters:" in plan
    assert "LessThan(l_quantity,10" in plan.replace(" ", "")
    # ReadSchema must be pruned to the two referenced columns
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema and "l_comment" not in read_schema


def test_startswith_prefix_predicate_pushes_down(spark, sf_dir):
    """S3: the reference's prefix scan (publish_to_catalog.py:263-265)
    becomes a StringStartsWith pushed to the parquet reader."""
    cust = load_table(spark, sf_dir, "customer")
    df = cust.filter(F.col("c_name").startswith("Customer#00000")).select("c_name")
    plan = plan_text(df)
    assert "StringStartsWith" in plan


def test_star_join_broadcasts_small_dimensions(spark, sf_dir):
    """J6 at scale: region/nation/customer dims must enter as broadcast
    joins — no shuffle of the lineitem fact table for dimension lookups."""
    plan = plan_text(q5_region(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # the fact-side aggregation is a partial+final hash aggregate
    assert "HashAggregate" in plan


def test_aggregate_is_partial_then_final(spark, sf_dir):
    """A1/A6: groupBy compiles to map-side partial aggregation before the
    exchange — the property that keeps 100 TB shuffles proportional to
    group cardinality, not row count."""
    plan = plan_text(q1_pricing(spark, sf_dir), "simple")
    first_agg = plan.index("HashAggregate")
    assert "partial_" in plan[first_agg:] or plan.count("HashAggregate") >= 2
    exchange = plan.index("Exchange")
    # partial aggregate appears below (after, in printed tree) the exchange
    assert plan.index("partial_", exchange) > exchange


def test_whole_stage_codegen_covers_expressions(spark, sf_dir):
    """F-surface expressions must run inside WholeStageCodegen, not as
    interpreted row transforms."""
    plan = plan_text(q1_pricing(spark, sf_dir), "codegen")
    assert "WholeStageCodegen" in plan


def test_aqe_wraps_shuffling_plans(spark, sf_dir):
    plan = plan_text(q5_region(spark, sf_dir), "simple")
    assert "AdaptiveSparkPlan" in plan


def test_no_python_udf_in_relational_hot_path(spark, sf_dir):
    """The relational surface must be pure JVM: no BatchEvalPython /
    ArrowEvalPython stages (Python is reserved for the §2.8 UDF surface)."""
    for q in (q1_pricing, q5_region):
        plan = plan_text(q(spark, sf_dir), "simple")
        assert "EvalPython" not in plan


def test_q6_all_predicates_push_to_scan(spark, sf_dir):
    """Q6's date/discount/quantity predicates must ALL reach the parquet
    reader — the pure-pushdown query is the scan-throughput measure at
    100 TB."""
    from ntd_gtfs_to_socrata_spark.queries.relational import q6_forecast

    plan = plan_text(q6_forecast(spark, sf_dir))
    pushed = next(l for l in plan.splitlines() if "PushedFilters" in l)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"


def test_runtime_bloom_filter_injects_on_selective_join(spark, sf_dir):
    """Runtime row-level filtering (SURVEY.md §4): when a shuffle join has
    a selective build side, Spark injects a bloom filter from the build
    side into the probe-side scan (BloomFilterAggregate → might_contain),
    cutting probe-side shuffle volume before the join. The application-side
    size gate (default 10 GB) exists precisely because this pays off at
    cluster scale, not fixture scale — lowered here only to pin the
    mechanism."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, sf_dir, "lineitem")
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = plan_text(j, "extended")
        assert "might_contain" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join handling (SCALE.md joins): a hot key whose shuffle
    partition dwarfs the median gets split into multiple tasks at runtime
    (AQEShuffleRead skewed → SortMergeJoin(skew=true)) — the automatic
    complement to the explicit salting in j6_salted_skew_join. Thresholds
    lowered to make fixture-sized skew visible; at cluster scale the
    defaults (256 MB / 5× median) trigger on real hot keys."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # 32 shuffle partitions so the non-hot keys spread thin and the
        # hot partition clears the factor-x-median test
        "spark.sql.shuffle.partitions": "32",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 400000, 1, 32).select(
            F.when(F.col("id") < 300000, 0).otherwise(F.col("id")).alias("k")
        )
        right = spark.range(0, 1000, 1, 8).select(F.col("id").alias("k"))
        j = left.join(right, "k").select("k")
        # only k=0 matches: left holds 300k rows of key 0 plus keys >= 300000,
        # right holds keys 0..999
        assert len(j.collect()) == 300000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_exchange_budgets_hold(spark, sf_dir):
    """Shuffle-count regression pins for the queries whose plans were
    hand-tuned (SCALE.md): a future edit that reintroduces a subtree
    recompute or an extra shuffle fails here, not at 100 TB. Budgets are
    ceilings (broadcast exchanges excluded), not exact counts, so benign
    plan jitter doesn't flap."""
    from ntd_gtfs_to_socrata_spark.queries import REGISTRY, load_all_query_modules

    load_all_query_modules()
    budgets = {
        "q1_pricing_summary": 1,
        "q6_forecast_revenue": 1,
        "w4_set_ops_single_pass": 2,
        "funnel_stages": 3,
        "tp_weighted_sample": 5,
        "sessionize_lag_gap": 2,
        "j8_snapshot_diff": 3,
        "tp_pack_sequences": 1,
    }
    for name, budget in budgets.items():
        plan = plan_text(REGISTRY[name](spark, sf_dir), "simple")
        n = sum(
            1
            for line in plan.splitlines()
            if "Exchange" in line and "BroadcastExchange" not in line
        )
        assert n <= budget, f"{name}: {n} shuffle exchanges > budget {budget}"
