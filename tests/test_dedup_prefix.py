"""Prefix-filtered set-similarity join (All-Pairs/PPJoin family): proves
the prefix prune is LOSSLESS (bit-identical pair set + Jaccard values vs
the full inverted index) and that it actually shrinks the index — the
boilerplate hot key that dominates the full index never becomes a join
key at all, because ultra-common shingles sort to the END of every
df-ordered set and fall outside the prefix."""

from __future__ import annotations

from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.operators import textops as TX
from ntd_gtfs_to_socrata_spark.operators.stagecache import release_all
from ntd_gtfs_to_socrata_spark.queries.dedup_text import (
    dedup_ngram_jaccard,
    dedup_prefix_filter_jaccard,
)
from tests.test_dedup_skew import skew_dir  # noqa: F401 — shared fixture


def _pairs(df):
    return {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in df.collect()}


def test_prefix_filter_matches_full_index(spark, sf_dir):
    try:
        full = _pairs(dedup_ngram_jaccard(spark, sf_dir))
        pref = _pairs(dedup_prefix_filter_jaccard(spark, sf_dir))
        assert pref == full
        assert len(full) > 0  # non-vacuous
    finally:
        release_all()


def test_prefix_filter_exact_on_adversarial_skew(spark, skew_dir):  # noqa: F811
    """On the 50%-boilerplate corpus the prefix join must still find every
    pair the full index finds — exactness under the adversarial shape the
    df cap only handles heuristically."""
    try:
        full = _pairs(dedup_ngram_jaccard(spark, skew_dir))
        pref = _pairs(dedup_prefix_filter_jaccard(spark, skew_dir))
        assert pref == full and len(full) > 0
    finally:
        release_all()


def test_prefix_index_excludes_hot_key(spark, skew_dir):  # noqa: F811
    """The boilerplate shingle (df = 50% of docs) must lose nearly all of
    its posting list in the PREFIX index: it can ride along only for docs
    so short that their prefix is the whole set."""
    docs = spark.read.parquet(skew_dir + "/documents.parquet")
    sh = (
        docs.select("doc_id", TX.word_shingles(TX.tokens(F.col("text"))).alias("s"))
        .select("doc_id", F.explode("s").alias("shingle_s"))
        .select("doc_id", F.xxhash64("shingle_s").alias("shingle"))
    )
    df_tbl = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    ordered = (
        sh.join(df_tbl, "shingle")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "shingle"))).alias("osh"))
        .select(
            "doc_id",
            F.transform("osh", lambda s: s["shingle"]).alias("sh"),
            F.size("osh").alias("n_sh"),
        )
    )
    prefix_len = (
        F.col("n_sh") - F.ceil(F.col("n_sh") * F.lit(0.2)) + F.lit(1)
    ).cast("int")
    pref = ordered.select(F.explode(F.slice("sh", 1, prefix_len)).alias("shingle"))
    hot = df_tbl.orderBy(F.col("df").desc()).limit(1).collect()[0]
    hot_in_prefix = pref.filter(F.col("shingle") == hot["shingle"]).count()
    assert hot["df"] >= 100  # fixture property: boilerplate in >= 50% of docs
    assert hot_in_prefix < hot["df"] * 0.2
