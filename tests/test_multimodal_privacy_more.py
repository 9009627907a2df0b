"""Pigeonhole completeness of the Hamming-LSH banding and l-diversity
semantics — properties beyond the oracle's value-hash."""

from __future__ import annotations

from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.io import load_table
from ntd_gtfs_to_socrata_spark.operators import multimodal as MM
from ntd_gtfs_to_socrata_spark.queries.multimodal_q import _PHASH_T, mm_phash_neardup
from ntd_gtfs_to_socrata_spark.queries.privacy_q import _L, privacy_l_diversity


def test_phash_banding_loses_no_pair_vs_bruteforce(spark, sf_dir):
    banded = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in mm_phash_neardup(spark, sf_dir).collect()
    }
    assert banded, "fixture corpus contains phash near-dups"
    # brute force: all-pairs hamming over the same band signatures
    bands = MM.phash_bands(
        MM.attach_payload(load_table(spark, sf_dir, "documents"))
    ).collect()
    brute = {}
    for i, a in enumerate(bands):
        for b in bands[i + 1 :]:
            h = sum(
                bin(a[f"b{j}"] ^ b[f"b{j}"]).count("1") for j in range(4)
            )
            if h <= _PHASH_T:
                key = (min(a["doc_id"], b["doc_id"]), max(a["doc_id"], b["doc_id"]))
                brute[key] = h
    assert banded == brute  # exact: pigeonhole guarantees zero recall loss


def test_phash_bands_are_16bit(spark, sf_dir):
    rows = MM.phash_bands(
        MM.attach_payload(load_table(spark, sf_dir, "documents"))
    ).collect()
    for r in rows:
        for j in range(4):
            assert 0 <= r[f"b{j}"] < (1 << 16)


def test_l_diversity_bounded_by_k_anonymity_universe(spark, sf_dir):
    row = privacy_l_diversity(spark, sf_dir).collect()[0]
    assert row["min_diversity"] >= 1
    assert 0 <= row["n_low_diversity"] <= row["n_groups"]
    assert row["min_entropy"] >= 0.0
    # a group below l distinct values has entropy < ln(l)
    import math

    if row["n_low_diversity"] > 0:
        assert row["min_entropy"] < math.log(_L) + 1e-9
    cust = load_table(spark, sf_dir, "customer")
    n_groups_direct = (
        cust.select(
            "c_nationkey", F.floor(F.col("c_acctbal") / 1000).alias("bal_band")
        )
        .distinct()
        .count()
    )
    assert row["n_groups"] == n_groups_direct
