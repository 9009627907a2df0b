"""End-to-end corpus release pipeline (▲ north-star composition; the
reference's analogous artifact is the whole publish run at
publish_to_catalog.py:584-611 — ingest → validate → sync → log — re-themed
for training-data release):

    documents
      → cleaning rules (text_gopher_rules semantics)     [filter]
      → exact dedup keep-one (min doc_id per text)        [1 shuffle]
      → near-dup keep-one (MinHash-LSH candidates →
        exact-Jaccard verify → CC → keep min per cluster) [bucketed]
      → decontamination (drop docs sharing any 3-gram
        shingle with the held-out eval slice)             [1 shuffle]
      → deterministic train/val/test split (md5 buckets)  [map-side]
      → partitioned write by split + release manifest

Every stage count is collected through ONE ``observe`` per stage frame —
the A5 pattern (no second scan per counter) — and the manifest the
pipeline returns is the artifact a release review signs off on.

Scale posture: each stage is an already-audited operator composed by
reference (rules = map-only; exact dedup = one content-hash shuffle;
near-dup = the LSH bucketed path, never all-pairs; decontamination = one
shingle-key shuffle with the eval side distinct-reduced first; split =
map-side md5). The write partitions by split so every downstream trainer
scans only its slice.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.operators import textops as TX


@dataclass
class CorpusReleaseResult:
    released: DataFrame  # doc_id, text, lang, source, split
    manifest: dict  # per-stage counts (filled after an action runs)
    observations: dict  # name -> Observation (driver reads post-action)


def _keep_rules(docs: DataFrame) -> DataFrame:
    """text_gopher_rules' conjunctive keep as a reusable filter (same
    thresholds; see queries/dedup_text.py for the per-rule audit query)."""
    toks = TX.tokens(F.col("text"))
    n = F.size(toks)
    mean_len = F.length("text").cast("double") / F.greatest(n, F.lit(1))
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / F.greatest(
        n, F.lit(1)
    )
    return docs.filter(
        (n >= 50) & (n <= 100000) & (mean_len >= 3) & (mean_len <= 10)
        & (distinct_ratio >= 0.3)
    )


def build_release(
    spark: SparkSession, sf_dir: str, jaccard_threshold: float = 0.5
) -> CorpusReleaseResult:
    from ntd_gtfs_to_socrata_spark.io import load_table
    from ntd_gtfs_to_socrata_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    # Observation names are session-unique; suffix so repeated builds in
    # one session (idempotency tests, retries) don't collide
    run_id = uuid.uuid4().hex[:8]
    obs: dict[str, Observation] = {
        k: Observation(f"{k}_{run_id}")
        for k in ("input", "ruled", "exact", "neardup", "decon")
    }

    staged = docs.observe(obs["input"], F.count(F.lit(1)).alias("n"))
    ruled = _keep_rules(staged).observe(obs["ruled"], F.count(F.lit(1)).alias("n"))

    # exact dedup keep-one: min doc_id per content digest (sha2 so the
    # shuffle carries 32 bytes, not documents — dedup_exact's scale note)
    canon = ruled.groupBy(F.sha2("text", 256).alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    exact = (
        ruled.join(canon.select("doc_id"), "doc_id", "left_semi")
        .observe(obs["exact"], F.count(F.lit(1)).alias("n"))
        # stage boundary: exact survivors feed the shingle index, the
        # keep-one anti-join AND the decontamination tagging — without a
        # materialization each branch re-runs rules+dedup (the SCALE.md
        # "subtree recompute" class). At 100 TB this is a checkpoint to
        # the lake between stages; locally persist() — unlike
        # localCheckpoint, the lineage stays a SQL plan, so the stage
        # observe counters still fire in the write action.
        .persist()
    )

    # near-dup keep-one over the survivors: shared-shingle pairs (hashed
    # keys, map-side i<j combos) -> jaccard >= t -> CC -> keep min
    exploded = (
        exact.select("doc_id", TX.word_shingles(TX.tokens(F.col("text"))).alias("sh"))
        .select("doc_id", F.size("sh").alias("n_sh"), F.explode("sh").alias("s"))
        .select("doc_id", "n_sh", F.xxhash64("s").alias("shingle"))
    )
    inv = (
        exploded.groupBy("shingle")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "n_sh"))).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    combos = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pairs = (
        inv.select(F.explode(combos).alias("p"))
        .groupBy(
            F.col("p.a.doc_id").alias("doc_a"),
            F.col("p.b.doc_id").alias("doc_b"),
            F.col("p.a.n_sh").alias("na"),
            F.col("p.b.n_sh").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("nc"))
        .filter(
            F.col("nc").cast("double")
            / (F.col("na") + F.col("nb") - F.col("nc"))
            >= jaccard_threshold
        )
        .select("doc_a", "doc_b")
    )
    cc = connected_components(pairs, src="doc_a", dst="doc_b")
    drop = (
        cc.groupBy("component_id")
        .agg(F.min("node").alias("keep"), F.collect_list("node").alias("members"))
        .select(F.explode("members").alias("doc_id"), "keep")
        .filter(F.col("doc_id") != F.col("keep"))
        .select("doc_id")
    )
    neardup = (
        exact.join(drop, "doc_id", "left_anti")
        .observe(obs["neardup"], F.count(F.lit(1)).alias("n"))
        # second stage boundary: survivors feed eval-shingle extraction,
        # train-shingle extraction, and the release base (3 branches)
        .persist()
    )

    # decontamination: eval slice = md5 bucket >= 98 (tp_hash_split's
    # held-out convention); drop any train doc sharing a shingle with it
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 100
    )
    tagged = neardup.withColumn("is_eval", bucket >= 98)
    eval_shingles = (
        tagged.filter(F.col("is_eval"))
        .select(F.explode(TX.word_shingles(TX.tokens(F.col("text")))).alias("s"))
        .select(F.xxhash64("s").alias("shingle"))
        .distinct()
    )
    train_shingled = tagged.filter(~F.col("is_eval")).select(
        "doc_id", F.explode(TX.word_shingles(TX.tokens(F.col("text")))).alias("s")
    ).select("doc_id", F.xxhash64("s").alias("shingle"))
    contaminated = train_shingled.join(eval_shingles, "shingle", "left_semi").select(
        "doc_id"
    ).distinct()
    decon = (
        tagged.filter(~F.col("is_eval"))
        .join(contaminated, "doc_id", "left_anti")
        .drop("is_eval")
        .observe(obs["decon"], F.count(F.lit(1)).alias("n"))
    )

    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "validation").otherwise("test")
    )
    released = decon.withColumn("split", split)
    return CorpusReleaseResult(released=released, manifest={}, observations=obs)


def write_release(result: CorpusReleaseResult, out_dir: str) -> dict:
    """Write partitioned by split, then read every stage counter from its
    Observation (ONE job, no per-counter rescans) into the manifest."""
    result.released.write.mode("overwrite").partitionBy("split").parquet(out_dir)
    manifest = {name: o.get["n"] for name, o in result.observations.items()}
    manifest["released"] = manifest["decon"]
    result.manifest.update(manifest)
    return manifest
