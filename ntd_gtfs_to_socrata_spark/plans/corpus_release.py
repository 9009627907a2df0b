"""End-to-end corpus release pipeline (▲ north-star composition; the
reference's analogous artifact is the whole publish run at
publish_to_catalog.py:584-611 — ingest → validate → sync → log — re-themed
for training-data release):

    documents
      → cleaning rules (ALL FIVE text_gopher_rules cuts)    [filter]
      → exact dedup keep-one (min doc_id per text)          [1 shuffle]
      → near-dup keep-one (df-capped shared-shingle
        inverted index → exact-Jaccard verify → CC →
        keep min per cluster)                               [bucketed]
      → decontamination (drop docs sharing any 3-gram
        shingle with the held-out eval slice)               [1 shuffle]
      → deterministic train/val/test split (md5 buckets)    [map-side]
      → partitioned write by split + release manifest

Every stage count is collected through ONE ``observe`` per stage frame —
the A5 pattern (no second scan per counter) — and the manifest the
pipeline returns is the artifact a release review signs off on.

Scale posture: each stage is an already-audited operator composed by
reference (rules = map-only; exact dedup = one content-hash shuffle;
near-dup = the df-capped inverted-index path from
``dedup_ngram_jaccard_dfcap`` — a shingle landing in more than
``_NEARDUP_DF_CAP`` docs is dropped from candidate generation, bounding
per-key pair fan-out to cap², never all-pairs; decontamination = one
shingle-key shuffle with the eval side distinct-reduced first; split =
map-side md5). The write partitions by split so every downstream trainer
scans only its slice.

Cache lifecycle (r6 ADVICE): the two stage boundaries are ``persist()``ed
so the 3-consumer branches don't re-run rules+dedup. Each
``build_release`` tracks its persisted frames in the result's ``cached``
list; ``write_release`` (and ``CorpusReleaseResult.close()``) unpersist
them, and a new build retires any still-live predecessor's caches first —
so repeated invocations in one session (oracle gate, bench passes) hold
at most ONE build's stages in executor memory.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.operators import textops as TX

# Candidate-generation document-frequency cap: a shingle appearing in more
# than this many surviving docs is boilerplate, not dup evidence — dropping
# it bounds the inverted-index fan-out (<= cap*(cap-1)/2 pairs per shingle)
# exactly as in queries/dedup_text.py::dedup_ngram_jaccard_dfcap. The
# DuckDB oracle applies the same cap, so the value hash certifies the
# capped semantics, not an uncapped ideal.
_NEARDUP_DF_CAP = 1000


@dataclass
class CorpusReleaseResult:
    released: DataFrame  # doc_id, text, lang, source, split
    manifest: dict  # per-stage counts (filled after an action runs)
    observations: dict  # name -> Observation (driver reads post-action)
    cached: list = field(default_factory=list)  # persisted stage frames

    def close(self) -> None:
        """Unpersist the stage-boundary caches (idempotent)."""
        while self.cached:
            df = self.cached.pop()
            df.unpersist()
            if df in _LIVE_STAGES:
                _LIVE_STAGES.remove(df)


# Stage frames persisted by builds whose result hasn't been close()d yet;
# the next build retires them so the query/bench path (which must return a
# LAZY frame and therefore cannot close before the caller's action) never
# accumulates more than one build's caches.
_LIVE_STAGES: list[DataFrame] = []


def _retire_predecessor_stages() -> None:
    while _LIVE_STAGES:
        _LIVE_STAGES.pop().unpersist()


def _keep_rules(docs: DataFrame) -> DataFrame:
    """text_gopher_rules' conjunctive keep as a reusable filter — ALL FIVE
    rules at the same thresholds (word count [50, 100k], mean word length
    [3, 10], >= 2 distinct stopwords, numeric-token ratio <= 0.2,
    distinct-token ratio >= 0.3); see queries/dedup_text.py for the
    per-rule audit query publishing each flag separately."""
    toks = TX.tokens(F.col("text"))
    n = F.size(toks)
    mean_len = F.length("text").cast("double") / F.greatest(n, F.lit(1))
    stop_arr = F.array(*[F.lit(s) for s in TX.STOPWORDS])
    n_stop = F.size(
        F.array_distinct(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    )
    numeric_ratio = (
        F.size(F.filter(toks, lambda x: x.rlike("^[0-9]+$"))).cast("double")
        / F.greatest(n, F.lit(1))
    )
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / F.greatest(
        n, F.lit(1)
    )
    return docs.filter(
        (n >= 50) & (n <= 100000) & (mean_len >= 3) & (mean_len <= 10)
        & (n_stop >= 2) & (numeric_ratio <= 0.2) & (distinct_ratio >= 0.3)
    )


def build_release(
    spark: SparkSession,
    sf_dir: str,
    jaccard_threshold: float = 0.5,
    cc_algorithm: str = "propagation",
) -> CorpusReleaseResult:
    """Assemble the release plan. ``cc_algorithm`` selects the
    connected-components implementation for the near-dup cluster step:
    ``"propagation"`` (min-label, default) or ``"star"`` (large-star/
    small-star, the diameter-safe O(log n) variant) — both produce the
    min-node component labeling, so the released corpus is IDENTICAL
    under either (asserted in tests/test_corpus_release.py)."""
    from ntd_gtfs_to_socrata_spark.io import load_table
    from ntd_gtfs_to_socrata_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    if cc_algorithm not in ("propagation", "star"):
        raise ValueError(f"unknown cc_algorithm: {cc_algorithm!r}")
    _retire_predecessor_stages()
    docs = load_table(spark, sf_dir, "documents")
    # Observation names are session-unique; suffix so repeated builds in
    # one session (idempotency tests, retries) don't collide
    run_id = uuid.uuid4().hex[:8]
    obs: dict[str, Observation] = {
        k: Observation(f"{k}_{run_id}")
        for k in ("input", "ruled", "exact", "neardup", "decon")
    }
    cached: list[DataFrame] = []

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
    cached.append(exact)

    # near-dup keep-one over the survivors: df-capped shared-shingle pairs
    # (hashed keys, map-side i<j combos) -> jaccard >= t -> CC -> keep min
    exploded = (
        exact.select("doc_id", TX.word_shingles(TX.tokens(F.col("text"))).alias("sh"))
        .select("doc_id", F.size("sh").alias("n_sh"), F.explode("sh").alias("s"))
        .select("doc_id", "n_sh", F.xxhash64("s").alias("shingle"))
    )
    inv = (
        exploded.groupBy("shingle")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "n_sh"))).alias("ds"))
        # df cap: drop posting lists longer than _NEARDUP_DF_CAP (pure
        # boilerplate shingles) so per-key pair fan-out is bounded — the
        # dedup_ngram_jaccard_dfcap posture; recall on genuinely similar
        # pairs survives because near-dups share many RARE shingles too
        .filter((F.size("ds") > 1) & (F.size("ds") <= _NEARDUP_DF_CAP))
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
    cc_fn = connected_components if cc_algorithm == "propagation" else (
        connected_components_star
    )
    cc = cc_fn(pairs, src="doc_a", dst="doc_b")
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
    cached.append(neardup)

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
    _LIVE_STAGES.extend(cached)
    return CorpusReleaseResult(
        released=released, manifest={}, observations=obs, cached=cached
    )


def write_release(result: CorpusReleaseResult, out_dir: str) -> dict:
    """Write partitioned by split, then read every stage counter from its
    Observation (ONE job, no per-counter rescans) into the manifest, then
    release the stage-boundary caches (r6 ADVICE: no leaked persists)."""
    result.released.write.mode("overwrite").partitionBy("split").parquet(out_dir)
    manifest = {name: o.get["n"] for name, o in result.observations.items()}
    manifest["released"] = manifest["decon"]
    result.manifest.update(manifest)
    result.close()
    return manifest
