"""Training-prep queries (tp_*): semantic invariants + plan posture.

Oracle parity runs in the driver gate; these assert the properties the
oracle can't express — split exhaustiveness/determinism, sampling being
map-side-only, top-k compiling to TakeOrderedAndProject, and packing
shuffling exactly once on the shard key.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.io import load_table
from ntd_gtfs_to_socrata_spark.queries.training_prep import (
    tp_hash_split,
    tp_pack_sequences,
    tp_shuffle_order,
    tp_stratified_sample,
)
from tests.test_plan_shape import plan_text


def test_hash_split_partitions_every_doc_exactly_once(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    splits = {r["split"]: r["n_docs"] for r in tp_hash_split(spark, sf_dir).collect()}
    assert set(splits) == {"train", "validation", "test"}
    assert sum(splits.values()) == docs.count()
    # 80/10/10 within binomial slack on the fixture
    n = sum(splits.values())
    assert 0.7 * n <= splits["train"] <= 0.9 * n


def test_split_and_sample_are_deterministic_across_runs(spark, sf_dir):
    a = sorted(tp_stratified_sample(spark, sf_dir).collect())
    b = sorted(tp_stratified_sample(spark, sf_dir).collect())
    assert a == b


def test_stratified_sample_is_pure_map_side(spark, sf_dir):
    """No Exchange in the plan: sampling must not shuffle."""
    plan = plan_text(tp_stratified_sample(spark, sf_dir))
    assert "Exchange" not in plan


def test_shuffle_order_uses_topk_not_global_sort(spark, sf_dir):
    """orderBy(hash).limit(k) must compile to TakeOrderedAndProject (plus
    the k-row window after), never a full Sort of the corpus."""
    plan = plan_text(tp_shuffle_order(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_pack_sequences_conserves_tokens_and_orders_bins(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    total_tokens = docs.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("t")
    ).collect()[0]["t"]
    bins = tp_pack_sequences(spark, sf_dir).collect()
    assert sum(r["bin_tokens"] for r in bins) == total_tokens
    # bins are contiguous per lang starting at 0
    by_lang: dict[str, list[int]] = {}
    for r in bins:
        by_lang.setdefault(r["lang"], []).append(r["seq_bin"])
    for lang, ids in by_lang.items():
        assert sorted(ids) == list(range(len(ids))), lang


def test_pack_sequences_shuffles_once_on_shard_key(spark, sf_dir):
    """One hash exchange (on lang) feeds both the window and the
    aggregation — partitioning is reused, not re-shuffled."""
    plan = plan_text(tp_pack_sequences(spark, sf_dir), mode="simple")
    assert plan.count("Exchange hashpartitioning") == 1


def test_ffd_never_uses_more_bins_than_contiguous_packing(spark, sf_dir):
    from ntd_gtfs_to_socrata_spark.queries.training_prep import (
        tp_pack_ffd,
        tp_pack_sequences,
    )

    ffd = {r["lang"]: r for r in tp_pack_ffd(spark, sf_dir).collect()}
    contiguous: dict[str, int] = {}
    for r in tp_pack_sequences(spark, sf_dir).collect():
        contiguous[r["lang"]] = contiguous.get(r["lang"], 0) + 1
    for lang, row in ffd.items():
        # every bin load respects the cap unless a single item overflows it
        loads = [int(x) for x in row["bin_loads"].split(",")]
        assert sum(loads) == row["total_tokens"]
        assert row["n_bins"] <= contiguous[lang]
        assert row["waste_tokens"] == row["n_bins"] * 512 - row["total_tokens"]


def test_cluster_aware_split_assigns_every_doc_once(spark, sf_dir):
    from ntd_gtfs_to_socrata_spark.queries.training_prep import (
        tp_cluster_aware_split,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = tp_cluster_aware_split(spark, sf_dir)
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    assert {r["split"] for r in out.select("split").distinct().collect()} <= {
        "train",
        "validation",
        "test",
    }


def test_cluster_aware_split_never_straddles_a_near_dup_pair(spark, sf_dir):
    """The leakage property itself: both endpoints of EVERY near-dup edge
    land in the same split (tp_hash_split keyed on doc_id violates this
    with ~28% probability per pair)."""
    from ntd_gtfs_to_socrata_spark.queries.dedup_text import (
        AUDIT_DF_CAP,
        _ngram_jaccard,
    )
    from ntd_gtfs_to_socrata_spark.queries.training_prep import (
        tp_cluster_aware_split,
    )

    assign = tp_cluster_aware_split(spark, sf_dir).select("doc_id", "split")
    pairs = _ngram_jaccard(spark, sf_dir, df_cap=AUDIT_DF_CAP)
    straddling = (
        pairs.join(
            assign.select(
                F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
            ),
            "doc_a",
        )
        .join(
            assign.select(
                F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
            ),
            "doc_b",
        )
        .filter(F.col("split_a") != F.col("split_b"))
        .count()
    )
    assert straddling == 0
    # sanity: the edge set is non-empty, so the property is non-vacuous
    assert pairs.count() > 0


def test_cluster_aware_split_matches_hash_split_on_singletons(spark, sf_dir):
    """Docs in no near-dup cluster have group_id = doc_id, so their
    bucket — and therefore their split — is EXACTLY tp_hash_split's:
    cluster-awareness perturbs only the clustered minority."""
    from ntd_gtfs_to_socrata_spark.queries.training_prep import (
        _bucket,
        tp_cluster_aware_split,
    )

    out = tp_cluster_aware_split(spark, sf_dir)
    singles = out.filter(F.col("group_id") == F.col("doc_id"))
    b = _bucket(F.col("doc_id"))
    expected = (
        F.when(b < 80, F.lit("train"))
        .when(b < 90, F.lit("validation"))
        .otherwise(F.lit("test"))
    )
    assert singles.filter(F.col("split") != expected).count() == 0
