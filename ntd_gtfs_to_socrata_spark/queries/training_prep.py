"""Training-data preparation queries over ``documents``: deterministic
hash-based splits, stratified sampling, epoch shuffling, and token-budget
sequence packing.

These are the corpus-assembly steps a large-scale training pipeline runs
after dedup/quality filtering (the rest of the north-star surface in
``dedup_text.py``). All randomness is *derived from content keys via md5*
rather than an RNG: at 100 TB a seed-based ``df.sample`` is not
reproducible across retries/speculative re-execution of a task, while a
hash of the row key is — and it is expressible identically in the DuckDB
oracle, so every query here is value-hash checked.

Cross-engine determinism contract: ``md5(cast(doc_id as string))`` is
byte-identical in Spark and DuckDB; the first 4 hex chars parsed base-16
(Spark ``conv(h, 16, 10)``, DuckDB ``CAST('0x' || h AS INTEGER)``) give a
uniform bucket in [0, 65536) reduced mod 100.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.io import ensure_min_parallelism, load_table
from ntd_gtfs_to_socrata_spark.operators import textops as TX
from ntd_gtfs_to_socrata_spark.queries import register

_BUCKET_SQL = "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER) % 100"


def _bucket(col: F.Column = None) -> F.Column:
    """Deterministic per-doc bucket in [0, 100) from md5 of the key."""
    key = (col if col is not None else F.col("doc_id")).cast("string")
    return (F.conv(F.substring(F.md5(key), 1, 4), 16, 10).cast("long") % 100).cast(
        "int"
    )


# ---------------------------------------------------------------------------
# Deterministic train/validation/test split
# ---------------------------------------------------------------------------

HASH_SPLIT_ORACLE = f"""
WITH b AS (
  SELECT n_chars, {_BUCKET_SQL} AS bucket FROM documents
)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'validation'
            ELSE 'test' END AS split,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM b GROUP BY split
"""


@register("tp_hash_split", HASH_SPLIT_ORACLE)
def tp_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/validation/test split keyed on md5(doc_id).

    Scale posture: the split column is a pure map expression — no shuffle,
    no RNG state, stable under task retries and across engines. Writing
    each split out is then a partitioned write (`partitionBy('split')`),
    so downstream readers partition-prune to their split.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = _bucket()
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("validation"))
        .otherwise(F.lit("test"))
    )
    return docs.withColumn("split", split).groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------

STRATIFIED_SAMPLE_ORACLE = f"""
WITH b AS (
  SELECT doc_id, lang, {_BUCKET_SQL} AS bucket FROM documents
)
SELECT doc_id, lang FROM b
WHERE bucket < CASE lang WHEN 'en' THEN 20 ELSE 60 END
"""


@register("tp_stratified_sample", STRATIFIED_SAMPLE_ORACLE)
def tp_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum downsampling (en at 20%, minority languages at 60%) —
    the corpus-rebalancing step, done as `bucket < threshold(lang)` rather
    than `df.sampleBy` so the sample is deterministic and re-runnable.

    Scale posture: pure map-side filter; the md5 only touches rows that
    survive predicate pushdown on other columns, and no stratum requires a
    groupBy (contrast `sampleBy`, which needs per-stratum fractions known
    up front anyway).
    """
    docs = load_table(spark, sf_dir, "documents")
    threshold = F.when(F.col("lang") == "en", F.lit(20)).otherwise(F.lit(60))
    return docs.filter(_bucket() < threshold).select("doc_id", "lang")


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle
# ---------------------------------------------------------------------------

SHUFFLE_ORDER_ORACLE = """
WITH h AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hh FROM documents
),
top AS (SELECT doc_id, hh FROM h ORDER BY hh LIMIT 20)
SELECT CAST(row_number() OVER (ORDER BY hh) AS BIGINT) AS epoch_pos, doc_id
FROM top
"""


@register("tp_shuffle_order", SHUFFLE_ORDER_ORACLE)
def tp_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch shuffling: global training order = sort by md5(doc_id); the
    query returns the first 20 positions of the epoch.

    Scale posture: `orderBy(hash).limit(k)` compiles to
    TakeOrderedAndProject (per-partition top-k + driver merge of k-row
    heaps — no global sort materialization). A full epoch write is the
    same sort expressed as a range-partitioned write; the row_number
    window here runs AFTER the limit, over 20 rows, never over the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    top = (
        docs.select("doc_id", F.md5(F.col("doc_id").cast("string")).alias("hh"))
        .orderBy("hh")
        .limit(20)
    )
    w = Window.orderBy("hh")
    return top.select(
        F.row_number().over(w).cast("long").alias("epoch_pos"), "doc_id"
    )


# ---------------------------------------------------------------------------
# Corpus profile
# ---------------------------------------------------------------------------

CORPUS_PROFILE_ORACLE = """
SELECT count(*) AS n_docs,
       CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_text,
       count(DISTINCT lang) AS n_langs,
       count(DISTINCT source) AS n_sources,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       round(avg(n_chars), 2) AS avg_chars
FROM documents
"""


@register("tp_corpus_profile", CORPUS_PROFILE_ORACLE)
def tp_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass corpus profile (the pre-ingest sanity check): row count,
    null-text count, stratum cardinalities, length min/max/mean.

    Scale posture: single scan, partial-agg map-side. The two exact
    countDistincts cost an Expand (×3 rows through the shuffle); at
    100 TB profiling swaps them for approx_count_distinct (see
    `a6_approx_distinct`) and the Expand disappears.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("text").isNull().cast("long")).alias("n_null_text"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
    )


# ---------------------------------------------------------------------------
# Token-budget sequence packing
# ---------------------------------------------------------------------------

PACK_SEQUENCES_ORACLE = """
WITH t AS (
  SELECT lang, doc_id,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
  FROM documents
),
c AS (
  SELECT lang, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens AS off
  FROM t
)
SELECT lang, CAST(floor(off / 512.0) AS BIGINT) AS seq_bin,
       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
FROM c GROUP BY lang, seq_bin
"""


@register("tp_pack_sequences", PACK_SEQUENCES_ORACLE)
def tp_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign each doc to the 512-token context-window
    bin where its running start offset lands (contiguous greedy packing —
    a doc whose offset falls in bin k joins bin k even if it overflows it,
    matching fixed-stride packing with spillover).

    Scale posture: the running sum partitions by `lang` (the shard key),
    so no global single-partition window; at 100 TB the shard key is
    (lang, shard_id) with shards sized to executors, and the same plan —
    one hash shuffle then a sorted within-partition scan — holds.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", "doc_id", F.size(TX.tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    offset = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("off")
    return (
        toks.select("lang", "n_tokens", offset)
        .groupBy("lang", F.floor(F.col("off") / 512.0).cast("long").alias("seq_bin"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Benchmark-contamination check (train/eval n-gram overlap)
# ---------------------------------------------------------------------------

CONTAMINATION_ORACLE = f"""
WITH tagged AS (
  SELECT doc_id, ({_BUCKET_SQL}) >= 98 AS is_eval,
         regexp_split_to_array(trim(text), '\\s+') AS t
  FROM documents
),
-- MATERIALIZED: shingled feeds BOTH the train and eval legs; DuckDB's
-- default inlining re-plans the tokenize+shingle pipeline per reference
-- (measured 390.7 s at sf1 vs 6.8 s Spark-side, r11). The hoisted `t`
-- also binds the regexp split once per doc instead of 3x per shingle.
shingled AS MATERIALIZED (
  SELECT doc_id, is_eval,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(t) - 1, 1)),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
  FROM tagged
),
train_sh AS (SELECT DISTINCT shingle FROM shingled WHERE NOT is_eval),
eval_sh AS (SELECT doc_id, shingle FROM shingled WHERE is_eval)
SELECT e.doc_id,
       count(*) AS n_shingles,
       CAST(sum(CASE WHEN t.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated,
       round(sum(CASE WHEN t.shingle IS NOT NULL THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 4) AS contamination_rate
FROM eval_sh e LEFT JOIN train_sh t ON e.shingle = t.shingle
GROUP BY e.doc_id
"""


@register("tp_contamination_check", CONTAMINATION_ORACLE)
def tp_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: for each held-out eval doc (top 2% of
    the md5 bucket space, so the eval set is deterministic), the fraction
    of its distinct word-3-grams that appear anywhere in the training
    split. This is the standard pre-training hygiene check (n-gram overlap
    between corpus and benchmarks) run INSIDE the engine.

    Scale posture: the eval set is tiny BY CONSTRUCTION (benchmarks, 2%
    of keyspace here), so its distinct shingle set broadcasts and the
    98%-of-corpus train side is probed MAP-SIDE (broadcast semi join
    inside the explode stage): the train shingles are never shuffled,
    never made distinct, never sorted. Only the surviving contaminated
    shingles (⊆ eval set) hit an exchange. The r1 formulation
    (distinct train shingles → sort-merge left join) shuffled the whole
    train shingle universe and was 6x slower at sf0.1; at 100 TB it
    would shuffle ~the corpus itself. At extreme eval sizes the
    broadcast side is xxhash64'd to 8-byte keys first; raw strings are
    kept here so the DuckDB oracle checks equality exactly."""
    docs = ensure_min_parallelism(load_table(spark, sf_dir, "documents"))
    tagged = docs.select(
        "doc_id",
        TX.word_shingles(TX.tokens(F.col("text"))).alias("sh"),
        (_bucket() >= 98).alias("is_eval"),
    )
    eval_sh = tagged.filter(F.col("is_eval")).select(
        "doc_id", F.explode("sh").alias("shingle")
    )
    # distinct shingles that occur in BOTH train and eval: stream the train
    # explode against the broadcast eval shingle set, dedupe the survivors
    contaminated = (
        tagged.filter(~F.col("is_eval"))
        .select(F.explode("sh").alias("shingle"))
        .join(F.broadcast(eval_sh.select("shingle").distinct()), "shingle", "left_semi")
        .distinct()
        .withColumn("hit", F.lit(True))
    )
    hit = F.col("hit").isNotNull()
    return (
        eval_sh.join(F.broadcast(contaminated), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(hit.cast("int")).cast("long").alias("n_contaminated"),
            F.round(
                F.sum(hit.cast("int")) / F.count(F.lit(1)).cast("double"), 4
            ).alias("contamination_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Source-mixture weights (data-mixture rebalancing)
# ---------------------------------------------------------------------------

MIXTURE_ORACLE = """
WITH per_source AS (
  SELECT source, count(*) AS n_docs,
         sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (SELECT sum(n_tokens) AS total_tokens, count(*) AS n_sources FROM per_source)
SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
       round(n_tokens / CAST(total_tokens AS DOUBLE), 4) AS actual_share,
       round((1.0 / n_sources) / (n_tokens / CAST(total_tokens AS DOUBLE)), 4)
         AS sample_weight
FROM per_source, tot
"""


@register("tp_mixture_weights", MIXTURE_ORACLE)
def tp_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture rebalancing (Pile/Dolma-style): per-source token counts
    and the sampling weight that would equalize every source to the uniform
    target share (1/n_sources, computed from the data). Feeding these
    weights into `tp_stratified_sample`'s deterministic-fraction machinery
    yields the rebalanced corpus.

    Scale posture: one map-side-combinable aggregation over the corpus +
    a 1-row total broadcast — the cheapest possible two-pass shape; the
    token count never leaves the executor as anything wider than a long."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(TX.tokens(F.col("text"))).cast("long")).alias("n_tokens"),
    )
    tot = per_source.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    share = F.col("n_tokens") / F.col("total_tokens").cast("double")
    return per_source.join(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(share, 4).alias("actual_share"),
        F.round((F.lit(1.0) / F.col("n_sources")) / share, 4).alias("sample_weight"),
    )


# ---------------------------------------------------------------------------
# Flagship end-to-end corpus pipeline: filter → near-dup keep-one → split
# ---------------------------------------------------------------------------

def _pipeline_oracle() -> str:
    from ntd_gtfs_to_socrata_spark.queries.dedup_text import (
        AUDIT_DF_CAP,
        _ngram_oracle,
    )

    return f"""
WITH RECURSIVE corpus AS MATERIALIZED (
  SELECT * FROM documents
  WHERE n_chars >= 60
    AND lang IN ('en', 'de', 'fr', 'es')
    AND len(regexp_split_to_array(trim(text), '\\s+')) >= 10
),
pairs_j AS MATERIALIZED ({_ngram_oracle(df_cap=AUDIT_DF_CAP, table='corpus')}),
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs_j
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs_j
),
reach(node, root) AS (
  SELECT DISTINCT src AS node, src AS root FROM edges
  UNION
  SELECT e.dst AS node, r.root AS root FROM reach r JOIN edges e ON e.src = r.node
),
cc AS (SELECT node, min(root) AS comp FROM reach GROUP BY node),
kept AS (
  SELECT d.doc_id, d.lang,
         len(regexp_split_to_array(trim(d.text), '\\s+')) AS n_tokens,
         {_BUCKET_SQL.replace('doc_id', 'd.doc_id')} AS bucket
  FROM corpus d LEFT JOIN cc ON d.doc_id = cc.node
  WHERE coalesce(cc.comp, d.doc_id) = d.doc_id
)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'validation'
            ELSE 'test' END AS split,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM kept GROUP BY split
"""


@register("tp_full_pipeline", _pipeline_oracle())
def tp_full_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus-assembly pipeline, end-to-end in ONE plan:
    quality gate (length + token floor + language allowlist) → shingle
    near-dup candidate pairs → connected components → keep the min-id doc
    per duplicate cluster (exact dups are jaccard-1.0 clusters, so this
    subsumes exact dedup) → deterministic 80/10/10 split accounting.
    Every stage is the registered operator it reuses
    ([[dedup_ngram_jaccard]], [[dedup_connected_components]],
    [[tp_hash_split]]); this query exists to prove they COMPOSE — the
    whole thing is still one value-hash-checked DataFrame.

    Scale posture: the quality gate is a pushed-down scan filter that
    shrinks every downstream stage; the component-map join is left to AQE
    (the map can be corpus-scale on dup-heavy web data, so no forced
    broadcast); split accounting is a map-side bucket + one aggregation."""
    from ntd_gtfs_to_socrata_spark.operators.graph import connected_components
    from ntd_gtfs_to_socrata_spark.queries.dedup_text import (
        AUDIT_DF_CAP,
        _ngram_jaccard,
    )

    docs = ensure_min_parallelism(load_table(spark, sf_dir, "documents")).filter(
        (F.col("n_chars") >= 60)
        & F.col("lang").isin("en", "de", "fr", "es")
        & (F.size(TX.tokens(F.col("text"))) >= 10)
    )
    pairs = _ngram_jaccard(spark, sf_dir, df_cap=AUDIT_DF_CAP, docs=docs)
    cc = connected_components(pairs, src="doc_a", dst="doc_b").select(
        F.col("node"), F.col("component_id").alias("comp")
    )
    kept = (
        docs.join(cc, docs.doc_id == cc.node, "left")
        .filter(F.coalesce(F.col("comp"), F.col("doc_id")) == F.col("doc_id"))
        .select(
            "doc_id",
            F.size(TX.tokens(F.col("text"))).cast("long").alias("n_tokens"),
            _bucket().alias("bucket"),
        )
    )
    split = (
        F.when(F.col("bucket") < 80, F.lit("train"))
        .when(F.col("bucket") < 90, F.lit("validation"))
        .otherwise(F.lit("test"))
    )
    return kept.select(split.alias("split"), "n_tokens").groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# Weighted rebalanced sample (mixture weights applied deterministically)
# ---------------------------------------------------------------------------

WEIGHTED_SAMPLE_ORACLE = """
WITH per_source AS (
  SELECT source, sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (SELECT sum(n_tokens) AS total_tokens, count(*) AS n_sources FROM per_source),
rates AS (
  SELECT source,
         least(1.0, (1.0 / n_sources) / (n_tokens / CAST(total_tokens AS DOUBLE)))
           AS keep_rate
  FROM per_source, tot
),
sampled AS (
  SELECT d.doc_id, d.source
  FROM documents d JOIN rates r ON d.source = r.source
  WHERE (CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) AS INTEGER) % 10000)
          < CAST(floor(r.keep_rate * 10000) AS INTEGER)
)
SELECT source, count(*) AS n_kept FROM sampled GROUP BY source
"""


@register("tp_weighted_sample", WEIGHTED_SAMPLE_ORACLE)
def tp_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[[tp_mixture_weights]] applied: each source keeps
    min(1, uniform_share/actual_share) of its docs via the deterministic
    md5 bucket in [0, 10000) — over-represented sources are downsampled
    toward the uniform token share, never upsampled (capped at 1). The
    rebalancing loop closed end-to-end, still value-hash checked.

    Scale posture: weights are |sources| rows broadcast into a map-side
    filter — the corpus is scanned once, no shuffle before the final
    accounting aggregation; identical to tp_stratified_sample's posture
    but with DATA-DERIVED fractions instead of configured ones."""
    docs = load_table(spark, sf_dir, "documents")
    # only the tokenizing branch needs the parallelism rebalance; the
    # sampling branch is a cheap md5 filter and keeps the raw scan
    per_source = ensure_min_parallelism(docs).groupBy("source").agg(
        F.sum(F.size(TX.tokens(F.col("text"))).cast("long")).alias("n_tokens")
    )
    # totals via a window over the ALREADY-AGGREGATED per-source frame
    # (|sources| rows): one tiny single-partition window instead of a
    # second aggregation + join, which would duplicate the per_source
    # subtree (its scan + 2 exchanges) in the plan.
    w_all = Window.partitionBy()
    rates = per_source.select(
        F.col("source").alias("r_source"),
        F.least(
            F.lit(1.0),
            (F.lit(1.0) / F.count(F.lit(1)).over(w_all))
            / (F.col("n_tokens") / F.sum("n_tokens").over(w_all).cast("double")),
        ).alias("keep_rate"),
    )
    bucket10k = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 10000
    ).cast("int")
    kept = (
        docs.join(F.broadcast(rates), docs.source == rates.r_source)
        .filter(bucket10k < F.floor(F.col("keep_rate") * 10000).cast("int"))
    )
    return kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))


# ---------------------------------------------------------------------------
# Exact-k deterministic reservoir per stratum
# ---------------------------------------------------------------------------

RESERVOIR_ORACLE = """
WITH h AS (
  SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS hh FROM documents
),
ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY hh, doc_id) AS rn
  FROM h
)
SELECT lang, doc_id, CAST(rn AS BIGINT) AS rn FROM ranked WHERE rn <= 25
"""


@register("tp_reservoir_per_stratum", RESERVOIR_ORACLE)
def tp_reservoir_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k sampling per stratum (25 docs per language): rank by
    md5(doc_id) within the stratum and keep the first k — the
    deterministic, retry-stable equivalent of per-group reservoir
    sampling, complementing [[tp_stratified_sample]]'s fraction-based
    form with exact-count semantics.

    Scale posture: one shuffle on the stratum key; WindowGroupLimit pushes
    rn<=k into the window sort so only k rows per stratum survive the
    shuffle read — the same top-k-per-group machinery as w3."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).cast("long").alias("rn"))
        .filter(F.col("rn") <= 25)
    )


# ---------------------------------------------------------------------------
# Temperature-scaled mixture resampling (multilingual / rare-source boost)
# ---------------------------------------------------------------------------

TEMPERATURE_ORACLE = """
WITH per_source AS (
  SELECT source,
         sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (SELECT sum(n_tokens) AS total_tokens FROM per_source),
p AS (
  SELECT source, n_tokens, n_tokens / CAST(total_tokens AS DOUBLE) AS share,
         (n_tokens / CAST(total_tokens AS DOUBLE))
           * (n_tokens / CAST(total_tokens AS DOUBLE)) AS pt,
         total_tokens
  FROM per_source, tot
),
z AS (SELECT sum(pt) AS z FROM p)
SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
       round(share, 4) AS actual_share,
       round(pt / z, 4) AS temp_share,
       round((pt / z) / share, 4) AS resample_weight,
       CAST(floor(pt / z * total_tokens) AS BIGINT) AS expected_tokens
FROM p, z
"""


@register("tp_temperature_resample", TEMPERATURE_ORACLE)
def tp_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled data mixture (the XLM-R / mT5 sampling rule):
    q_i ∝ p_i^(1/τ) with τ = 0.5 — rare sources are up-weighted, dominant
    sources damped, less aggressively than [[tp_mixture_weights]]'s uniform
    target. The exponent 1/τ = 2 is written as an exact square on both
    engines so no libm ``pow`` ULP difference can leak through the 4dp
    rounding. `resample_weight` feeds the same deterministic keep-rate
    machinery as [[tp_weighted_sample]].

    Scale posture: one map-side-combinable token-count aggregation over the
    corpus; the two scalars (total, normalizer Z) ride as broadcast 1-row
    cross joins — the corpus is scanned once and never re-shuffled."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.sum(F.size(TX.tokens(F.col("text"))).cast("long")).alias("n_tokens")
    )
    tot = per_source.agg(F.sum("n_tokens").alias("total_tokens"))
    share = F.col("n_tokens") / F.col("total_tokens").cast("double")
    p = per_source.join(F.broadcast(tot)).select(
        "source", "n_tokens", "total_tokens",
        share.alias("share"), (share * share).alias("pt"),
    )
    z = p.agg(F.sum("pt").alias("z"))
    q = F.col("pt") / F.col("z")
    return p.join(F.broadcast(z)).select(
        "source",
        "n_tokens",
        F.round("share", 4).alias("actual_share"),
        F.round(q, 4).alias("temp_share"),
        F.round(q / F.col("share"), 4).alias("resample_weight"),
        F.floor(q * F.col("total_tokens")).cast("long").alias("expected_tokens"),
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity-bucket filter (head / middle / tail)
# ---------------------------------------------------------------------------

PERPLEXITY_FILTER_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
vocab AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY tok
),
tot AS (SELECT sum(c) AS n FROM vocab),
scored AS (
  SELECT t.doc_id, ln(v.c / CAST(tot.n AS DOUBLE)) AS lp
  FROM toks t JOIN vocab v ON t.tok = v.tok, tot
),
scores AS (
  SELECT doc_id, count(*) AS n_tokens, round(avg(lp), 4) AS avg_logprob
  FROM scored GROUP BY doc_id
),
thr AS (
  SELECT list_transform(quantile_cont(avg_logprob, [1.0/3, 2.0/3]),
                        x -> floor(x * 10000 + 0.5) / 10000) AS t
  FROM scores
),
bucketed AS (
  SELECT s.doc_id, s.n_tokens, s.avg_logprob,
         CASE WHEN s.avg_logprob >= thr.t[2] THEN 'head'
              WHEN s.avg_logprob >= thr.t[1] THEN 'middle'
              ELSE 'tail' END AS bucket
  FROM scores s, thr
)
SELECT bucket,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       floor(sum(CAST(floor(avg_logprob * 10000 + 0.5) AS BIGINT))
             / count(*) + 0.5) / 10000 AS mean_logprob
FROM bucketed GROUP BY bucket
"""


@register("tp_perplexity_filter", PERPLEXITY_FILTER_ORACLE)
def tp_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing: score every doc with the
    corpus-trained unigram LM (``text_unigram_logprob``), cut the score
    distribution at its terciles, and label docs head / middle / tail.
    CCNet keeps head+middle and drops (or down-samples) the tail; the
    per-bucket doc/token accounting here is exactly the retention report
    that decision reads.

    Determinism across engines: scores are rounded to 4 decimals BEFORE
    the tercile computation, both engines compute the cut points with
    the same linear-interpolation definition (Spark ``percentile`` ≡
    DuckDB ``quantile_cont``) on the same doubles, and bucket compares
    use >= on those quantised values.

    Scale posture: the tercile thresholds are a 1-row exact-percentile
    aggregate broadcast back as a cross join (at 100 TB swap in
    ``approx_percentile`` — same plan shape, sketch-mergeable); the
    corpus-sized frame is touched by one map-side CASE after that
    broadcast. No global sort, no window."""
    from ntd_gtfs_to_socrata_spark.operators.stagecache import stage_boundary
    from ntd_gtfs_to_socrata_spark.queries.dedup_text import text_unigram_logprob

    # Stage boundary: the score frame feeds BOTH the tercile aggregate and
    # the bucketing pass. Measured in r7 (tools/measure_exchanges.py):
    # without this persist the whole unigram-LM pipeline re-executed for
    # the threshold branch (8 executed / 1 reused shuffle stages); with it
    # the pipeline runs once and the frame cached is doc-count-sized
    # (doc_id, n_tokens, avg_logprob) — the cheapest possible boundary.
    scores = stage_boundary(
        text_unigram_logprob(spark, sf_dir), "tp_perplexity_scores"
    )
    # Tercile thresholds QUANTIZED to the score grid (caught by the r7
    # sf0.1 gate): the engines' linear-interpolation formulas differ by an
    # ulp — DuckDB returned -3.4014999999999995 where Spark returned
    # exactly -3.4015, flipping every doc sitting ON the cut into a
    # different bucket. Scores are 1e-4-quantized and the interpolation
    # fraction is always in {0, 1/3, 2/3} (it comes from (n-1)/3), so the
    # interpolated value is never closer than ~1.7e-5 to a half-up
    # rounding boundary: floor(x*1e4+0.5)/1e4 lands both engines on the
    # identical grid value.
    thr = scores.agg(
        F.transform(
            F.percentile("avg_logprob", [1.0 / 3, 2.0 / 3]),
            lambda x: F.floor(x * 10000 + 0.5) / 10000,
        ).alias("t")
    )
    bucket = (
        F.when(F.col("avg_logprob") >= F.element_at("t", 2), "head")
        .when(F.col("avg_logprob") >= F.element_at("t", 1), "middle")
        .otherwise("tail")
    )
    return (
        scores.crossJoin(F.broadcast(thr))
        .select("doc_id", "n_tokens", "avg_logprob", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            # order-free bucket mean (caught by the r7 sf0.1 gate): the
            # per-doc scores are 4-decimal-quantized and bit-identical
            # across engines, but summing ~thousands of doubles in
            # different orders drifts the last ulp and avg() then rounds
            # across the .xxxx5 boundary differently. Integerize each
            # score (x1e4, exact by construction), sum as BIGINT (exact,
            # order-free), divide once, floor-based half-up — every step
            # bit-identical in Spark and DuckDB.
            (
                F.floor(
                    F.sum(
                        F.floor(F.col("avg_logprob") * 10000 + F.lit(0.5)).cast(
                            "long"
                        )
                    ).cast("double")
                    / F.count(F.lit(1))
                    + 0.5
                )
                / 10000
            ).alias("mean_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# Fixed-window document chunking (context-length packing's sibling)
# ---------------------------------------------------------------------------

_CHUNK = 32  # tokens per chunk
_STRIDE = 24  # chunk stride (overlap = _CHUNK - _STRIDE)

CHUNK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents
),
c AS (
  SELECT doc_id,
         list_transform(range(0, len(toks), {_STRIDE}),
                        p -> array_to_string(toks[p + 1 : p + {_CHUNK}], ' ')) AS chunks
  FROM t
)
SELECT doc_id,
       CAST(generate_subscripts(chunks, 1) - 1 AS INT) AS chunk_idx,
       CAST(len(regexp_split_to_array(unnest(chunks), ' ')) AS BIGINT) AS n_tokens,
       md5(unnest(chunks)) AS chunk_md5
FROM c
"""


@register("tp_chunk_documents", CHUNK_ORACLE)
def tp_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: split every doc into 32-token
    chunks at stride 24 (8-token overlap so no sentence is ever cut
    without context on either side) — the step that turns variable-length
    documents into model-context-sized training samples when packing
    whole docs (``tp_pack_sequences``) isn't wanted. The md5 of each
    chunk is part of the checked output, so chunk CONTENT (not just
    counts) is proven identical across engines.

    Scale posture: chunk generation is entirely map-side (sequence →
    slice → array_join inside codegen, then one posexplode); there is NO
    shuffle at all — the output stays partitioned exactly like the input
    scan, which is what you want feeding a partitioned tokenizer write.
    Overlap factor (_CHUNK/_STRIDE) multiplies output rows, not shuffle
    volume."""
    docs = ensure_min_parallelism(load_table(spark, sf_dir, "documents"))
    toks = TX.tokens(F.col("text"))
    chunks = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 1, F.lit(_STRIDE)),
        lambda p: F.array_join(F.slice(toks, p + 1, _CHUNK), " "),
    )
    return docs.select("doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk")).select(
        "doc_id",
        "chunk_idx",
        F.size(F.split("chunk", " ")).cast("long").alias("n_tokens"),
        F.md5("chunk").alias("chunk_md5"),
    )


# ---------------------------------------------------------------------------
# DSIR-style importance weighting (target-domain resampling signal)
# ---------------------------------------------------------------------------

DSIR_ORACLE = """
WITH toks AS (
  SELECT doc_id, source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
raw_v AS (SELECT tok, count(*) AS cr FROM toks GROUP BY tok),
tgt_v AS (SELECT tok, count(*) AS ct FROM toks WHERE source = 'src0' GROUP BY tok),
consts AS (
  SELECT (SELECT count(*) FROM raw_v) AS vsize,
         (SELECT sum(cr) FROM raw_v) AS nr,
         (SELECT coalesce(sum(ct), 0) FROM tgt_v) AS nt
),
lp AS (
  SELECT r.tok,
         ln((coalesce(t.ct, 0) + 1) / CAST(nt + vsize AS DOUBLE))
         - ln((r.cr + 1) / CAST(nr + vsize AS DOUBLE)) AS llr
  FROM raw_v r LEFT JOIN tgt_v t ON r.tok = t.tok, consts
)
SELECT k.doc_id,
       count(*) AS n_tokens,
       round(sum(l.llr), 4) AS log_importance,
       (sum(l.llr) > 0) AS target_like
FROM toks k JOIN lp l ON k.tok = l.tok
GROUP BY k.doc_id
"""


@register("tp_dsir_importance", DSIR_ORACLE)
def tp_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weighting (Xie et al., "Data Selection for
    Language Models via Importance Resampling"): score every raw-corpus
    doc by the log-likelihood ratio of a target-domain unigram LM (docs
    from source='src0') vs the raw-corpus LM, add-1 smoothed over the
    shared vocabulary. Positive log-importance = the doc looks more like
    the target domain than the background — the map-side selection signal
    for domain-targeted resampling (a fixed threshold, NOT a global
    quantile, so selection never needs a global sort).

    Scale posture: ONE token-key aggregate computes BOTH corpus counts
    (cr = all docs, ct = conditional count over source='src0' — a dual
    count in the same partial+final pass, so the raw⋈target vocab join
    the textbook formulation needs never exists), the three corpus
    constants reduce that vocab to a 1-row scalar aggregate broadcast
    back via crossJoin (the tp_mixture_weights shape), and per-doc
    scoring is the same token-key join + doc_id aggregate as
    text_unigram_logprob. Two shuffles total on the data plane. Nothing
    global, nothing driver-side."""
    docs = ensure_min_parallelism(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", "source", F.explode(TX.tokens(F.col("text"))).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("cr"),
        F.count(F.when(F.col("source") == "src0", 1)).alias("ct"),
    )
    consts = vocab.agg(
        F.count(F.lit(1)).cast("double").alias("vsize"),
        F.sum("cr").cast("double").alias("nr"),
        F.sum("ct").cast("double").alias("nt"),
    )
    lp = vocab.crossJoin(F.broadcast(consts)).select(
        F.col("tok").alias("v_tok"),
        (
            F.log((F.col("ct") + 1) / (F.col("nt") + F.col("vsize")))
            - F.log((F.col("cr") + 1) / (F.col("nr") + F.col("vsize")))
        ).alias("llr"),
    )
    return (
        toks.join(lp, toks.tok == lp.v_tok)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("llr"), 4).alias("log_importance"),
            (F.sum("llr") > 0).alias("target_like"),
        )
    )


# ---------------------------------------------------------------------------
# Length-bucketed batching (padding-waste accounting)
# ---------------------------------------------------------------------------

_LB_BUDGET = 4096  # token budget per batch
_LB_POWS = [2**k for k in range(4, 14)]  # bucket lengths 16..8192

_LB_CASE_SQL = "CASE " + " ".join(
    f"WHEN n_tok <= {p} THEN {p}" for p in _LB_POWS
) + f" ELSE {_LB_POWS[-1]} END"

LENGTH_BUCKET_ORACLE = f"""
WITH lens AS (
  SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok
  FROM documents
),
bucketed AS (
  SELECT doc_id, n_tok, {_LB_CASE_SQL} AS bucket_len FROM lens
)
SELECT CAST(bucket_len AS BIGINT) AS bucket_len,
       count(*) AS n_seqs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       CAST(count(*) * bucket_len AS BIGINT) AS padded_tokens,
       round(1.0 - CAST(sum(n_tok) AS DOUBLE) / (count(*) * bucket_len), 4)
         AS pad_ratio,
       CAST(ceil(CAST(count(*) AS DOUBLE)
                 / greatest({_LB_BUDGET} // bucket_len, 1)) AS BIGINT)
         AS n_batches
FROM bucketed GROUP BY bucket_len
"""


@register("tp_length_bucketed_batching", LENGTH_BUCKET_ORACLE)
def tp_length_bucketed_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch planning — the padding-waste killer in LLM
    training: sequences grouped into power-of-2 length buckets (16..8192),
    each bucket batched to a 4096-token budget; reports per-bucket
    sequence count, real vs padded token totals, padding ratio, and batch
    count. Bucket assignment is a chain of INTEGER comparisons (never
    ``2^ceil(log2 n)`` — FP log at exact powers of two flips the bucket),
    so Spark and DuckDB agree bit-exactly.

    Scale posture: one map-side bucket assignment + one key aggregation —
    the whole plan is a single shuffle on ≤ 10 bucket keys with partial
    aggregation; the corpus never moves."""
    docs = ensure_min_parallelism(load_table(spark, sf_dir, "documents"))
    n_tok = F.size(TX.tokens(F.col("text")))
    bucket = F.lit(_LB_POWS[-1])
    for p in reversed(_LB_POWS):
        bucket = F.when(n_tok <= p, F.lit(p)).otherwise(bucket)
    lens = docs.select(n_tok.alias("n_tok"), bucket.cast("long").alias("bucket_len"))
    batch_size = F.greatest(
        F.floor(F.lit(_LB_BUDGET) / F.col("bucket_len")), F.lit(1)
    )
    return (
        lens.groupBy("bucket_len")
        .agg(
            F.count(F.lit(1)).alias("n_seqs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            (F.count(F.lit(1)) * F.first("bucket_len")).cast("long").alias("padded_tokens"),
        )
        .select(
            "bucket_len",
            "n_seqs",
            "total_tokens",
            "padded_tokens",
            F.round(
                1.0 - F.col("total_tokens").cast("double") / F.col("padded_tokens"), 4
            ).alias("pad_ratio"),
            F.ceil(F.col("n_seqs").cast("double") / batch_size)
            .cast("long")
            .alias("n_batches"),
        )
    )


# ---------------------------------------------------------------------------
# Packing boundaries (attention-mask input)
# ---------------------------------------------------------------------------

PACK_BOUNDARIES_ORACLE = """
WITH t AS (
  SELECT lang, doc_id,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
  FROM documents
),
c AS (
  SELECT lang, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens AS off
  FROM t
)
SELECT lang, CAST(floor(off / 512.0) AS BIGINT) AS seq_bin,
       count(*) AS n_docs,
       array_to_string(list(CAST(off - CAST(floor(off / 512.0) AS BIGINT) * 512
                             AS BIGINT) ORDER BY off), ',') AS boundaries
FROM c GROUP BY lang, seq_bin
"""


@register("tp_pack_boundaries", PACK_BOUNDARIES_ORACLE)
def tp_pack_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The attention-mask companion to ``tp_pack_sequences``: per packed
    512-token bin, the SORTED in-bin start offsets of every document it
    holds — exactly the boundary list a packed-attention kernel (or
    position-id reset) consumes. Same lang-partitioned running-sum
    window; the boundary array is bin-local so downstream masking never
    recomputes global offsets.

    Scale posture: identical to tp_pack_sequences — one hash shuffle on
    the shard key, the window and the boundary collect_list both ride the
    per-shard partitioning (collect_list output is bounded by docs per
    512-token bin)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", "doc_id", F.size(TX.tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    off = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("off")
    c = toks.select("lang", "n_tokens", off)
    bin_col = F.floor(F.col("off") / 512.0).cast("long")
    return (
        c.select("lang", bin_col.alias("seq_bin"), (F.col("off") - bin_col * 512).alias("b"))
        .groupBy("lang", "seq_bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            # emitted as a comma-joined string: the driver value-hash
            # factorizes cells, and array cells are unhashable there
            F.array_join(
                F.array_sort(F.collect_list(F.col("b").cast("long"))), ","
            ).alias("boundaries"),
        )
    )


# ---------------------------------------------------------------------------
# Frequency-interleaved dataset scheduling (tf.data interleave analog)
# ---------------------------------------------------------------------------

INTERLEAVE_ORACLE = """
WITH ranked AS (
  SELECT doc_id, source,
         CAST(row_number() OVER (
           PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR))
         ) AS BIGINT) AS src_rank,
         CASE WHEN source = 'src0' THEN 2 ELSE 1 END AS weight
  FROM documents
),
sched AS (
  SELECT doc_id, source, src_rank,
         CAST(src_rank AS DOUBLE) / weight AS sched_pos
  FROM ranked
)
SELECT doc_id, source, src_rank, round(sched_pos, 2) AS sched_pos
FROM sched
ORDER BY sched_pos, source, doc_id
LIMIT 50
"""


@register("tp_interleave_datasets", INTERLEAVE_ORACLE)
def tp_interleave_datasets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-based corpus interleaving (the tf.data
    ``sample_from_datasets`` analog, made deterministic): source src0 is
    consumed at weight 2, every other source at weight 1; each doc's
    schedule position is src_rank/weight, and merging all sources by
    schedule position yields the exact 2:1:...:1 interleave an epoch
    reader consumes. First 50 schedule slots returned.

    Scale posture: per-source ranks are windows PARTITIONED BY SOURCE
    (bounded by per-source cardinality; at 100 TB the key widens to
    (source, shard) like tp_pack_sequences); the merge is
    ``orderBy(...).limit(k)`` = TakeOrderedAndProject, never a global
    sort materialization — an epoch-sized consumer swaps the limit for a
    range-partitioned write."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")))
    ranked = docs.select(
        "doc_id",
        "source",
        F.row_number().over(w).cast("long").alias("src_rank"),
        F.when(F.col("source") == "src0", F.lit(2)).otherwise(F.lit(1)).alias("weight"),
    )
    sched = ranked.select(
        "doc_id",
        "source",
        "src_rank",
        F.round(F.col("src_rank").cast("double") / F.col("weight"), 2).alias("sched_pos"),
    )
    return sched.orderBy("sched_pos", "source", "doc_id").limit(50)


# ---------------------------------------------------------------------------
# Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES)
# ---------------------------------------------------------------------------

_AES_MOD = 999_983  # prime modulus for the md5-derived uniform
_AES_K = 20

AES_ORACLE = f"""
WITH u AS (
  SELECT doc_id, n_chars,
         (CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
               % {_AES_MOD} AS DOUBLE) + 1) / ({_AES_MOD} + 1) AS uni
  FROM documents
),
keyed AS (
  SELECT doc_id, n_chars, round(ln(uni) / n_chars, 10) AS es_key FROM u
)
SELECT doc_id, n_chars, round(es_key * 1000000, 4) AS es_key_ppm
FROM keyed
ORDER BY es_key DESC, doc_id ASC
LIMIT {_AES_K}
"""


@register("tp_weighted_sample_aes", AES_ORACLE)
def tp_weighted_sample_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, the Efraimidis–Spirakis
    exponential-keys algorithm: each row gets key u^(1/w) (here ranked by
    the monotone-equivalent ln(u)/w — no pow), the k largest keys ARE a
    weighted WOR sample. The distributed-native WOR method: one map-side
    key expression + a top-k, no sequential draw-and-remove loop, and it
    composes with per-partition pre-selection (each partition's top-k
    contains the global top-k). Weight = n_chars; u is the md5-derived
    uniform shared with every other sampler here, so DuckDB replays the
    draw exactly.

    Scale posture: ``orderBy(key).limit(k)`` = TakeOrderedAndProject
    (per-partition partial top-k, one k·partitions merge) — never a
    global sort."""
    docs = load_table(spark, sf_dir, "documents")
    uni = (
        (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
         .cast("long") % _AES_MOD).cast("double") + 1
    ) / (_AES_MOD + 1)
    keyed = docs.select(
        "doc_id",
        "n_chars",
        F.round(F.log(uni) / F.col("n_chars"), 10).alias("es_key"),
    )
    return (
        keyed.orderBy(F.col("es_key").desc(), F.col("doc_id").asc())
        .limit(_AES_K)
        .select(
            "doc_id",
            "n_chars",
            F.round(F.col("es_key") * 1_000_000, 4).alias("es_key_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# First-fit-decreasing packing (the optimizing twin of tp_pack_sequences)
# ---------------------------------------------------------------------------

_FFD_CAP = 512

_FFD_POS = (
    "list_position(list_transform(acc, b -> b + x[1] <= {cap}), true)"
).format(cap=_FFD_CAP)

FFD_ORACLE = f"""
WITH t AS (
  SELECT lang, len(regexp_split_to_array(trim(text), '\\s+')) AS n
  FROM documents
),
arrs AS (
  SELECT lang, list_sort(list(CAST(n AS BIGINT)), 'DESC') AS items
  FROM t GROUP BY lang
),
folded AS (
  SELECT lang, items,
    reduce(
      list_prepend([]::BIGINT[], list_transform(items, x -> [x])),
      (acc, x) -> CASE
        WHEN {_FFD_POS} IS NULL OR {_FFD_POS} = 0
        THEN list_append(acc, x[1])
        ELSE acc[1 : {_FFD_POS} - 1]
             || [acc[{_FFD_POS}] + x[1]]
             || acc[{_FFD_POS} + 1 : len(acc)]
      END
    ) AS bins
  FROM arrs
)
SELECT lang,
       CAST(len(items) AS BIGINT) AS n_seqs,
       CAST(list_aggregate(items, 'sum') AS BIGINT) AS total_tokens,
       CAST(len(bins) AS BIGINT) AS n_bins,
       CAST(len(bins) * {_FFD_CAP} - list_aggregate(items, 'sum') AS BIGINT)
         AS waste_tokens,
       array_to_string(list_sort(bins, 'DESC'), ',') AS bin_loads
FROM folded
"""


@register("tp_pack_ffd", FFD_ORACLE)
def tp_pack_ffd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit-DECREASING sequence packing — the optimizing twin of
    ``tp_pack_sequences``'s contiguous packing (FFD ≤ 11/9·OPT + 1 bins;
    contiguous packing has no such bound): items sorted longest-first,
    each placed in the first 512-token bin that fits, expressed as a PURE
    ``aggregate`` HOF fold over the per-shard item array — no driver
    loop, no UDF. The DuckDB oracle runs the IDENTICAL fold via
    ``reduce`` (accumulator = bin-loads list), so both engines replay
    byte-equal packings including the final per-bin loads.

    Determinism: ties are equal values, and first-fit is insensitive to
    the order of equal items, so the sorted-desc fold is unique.

    Scale posture: one shuffle groups items per shard key (lang; widen
    to (lang, shard) at 100 TB exactly like tp_pack_sequences) and the
    fold runs inside codegen per shard — state is the bin-load array,
    bounded by bins-per-shard. A shard's items must fit an executor
    (same grouped-array contract as every collect_list here, documented
    per SCALE.md's Python-boundary note)."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("lang", F.size(TX.tokens(F.col("text"))).cast("long").alias("n"))
    arrs = t.groupBy("lang").agg(
        F.reverse(F.array_sort(F.collect_list("n"))).alias("items")
    )

    def step(acc, x):
        fits = F.transform(acc, lambda b: b + x <= _FFD_CAP)
        pos = F.coalesce(F.array_position(fits, F.lit(True)), F.lit(0))
        appended = F.concat(acc, F.array(x))
        placed = F.concat(
            F.slice(acc, 1, (pos - 1).cast("int")),
            F.array(F.element_at(acc, pos.cast("int")) + x),
            F.when(
                pos < F.size(acc),
                F.slice(acc, (pos + 1).cast("int"), F.size(acc)),
            ).otherwise(F.array().cast("array<bigint>")),
        )
        return F.when(pos == 0, appended).otherwise(placed)

    bins = F.aggregate(F.col("items"), F.array().cast("array<bigint>"), step)
    return arrs.select(
        "lang",
        F.size("items").cast("long").alias("n_seqs"),
        F.aggregate("items", F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "total_tokens"
        ),
        F.size(bins).cast("long").alias("n_bins"),
        (
            F.size(bins).cast("long") * _FFD_CAP
            - F.aggregate("items", F.lit(0).cast("long"), lambda a, x: a + x)
        ).alias("waste_tokens"),
        F.array_join(F.reverse(F.array_sort(bins)), ",").alias("bin_loads"),
    )


# ---------------------------------------------------------------------------
# Fuzzy train/eval decontamination (MinHash-LSH, asymmetric)
# ---------------------------------------------------------------------------

_DECON_T = 0.5  # near-match Jaccard above which a train doc is contaminated
_DECON_EVAL_BUCKET = 90  # md5 buckets >= this form the held-out eval set


def _decon_fuzzy_oracle() -> str:
    from ntd_gtfs_to_socrata_spark.queries.dedup_text import MINHASH_ORACLE

    return f"""
WITH sigs AS MATERIALIZED ({MINHASH_ORACLE}),
split AS (
  SELECT doc_id,
         ({_BUCKET_SQL}) >= {_DECON_EVAL_BUCKET} AS is_eval
  FROM documents
),
bands AS (
  SELECT doc_id, 0 AS band, mh0 AS x, mh1 AS y FROM sigs
  UNION ALL SELECT doc_id, 1, mh2, mh3 FROM sigs
  UNION ALL SELECT doc_id, 2, mh4, mh5 FROM sigs
  UNION ALL SELECT doc_id, 3, mh6, mh7 FROM sigs
),
cand AS (
  SELECT DISTINCT t.doc_id AS train_id, e.doc_id AS eval_id
  FROM bands t
  JOIN split st ON st.doc_id = t.doc_id AND NOT st.is_eval
  JOIN bands e ON e.band = t.band AND e.x = t.x AND e.y = t.y
  JOIN split se ON se.doc_id = e.doc_id AND se.is_eval
),
toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
shingled AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
                                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
  FROM toks
),
sizes AS (SELECT doc_id, len(sh) AS n_sh FROM shingled),
expl AS (SELECT doc_id, unnest(sh) AS shingle FROM shingled),
common AS (
  SELECT c.train_id, c.eval_id, count(*) AS nc
  FROM cand c
  JOIN expl a ON a.doc_id = c.train_id
  JOIN expl b ON b.doc_id = c.eval_id AND b.shingle = a.shingle
  GROUP BY c.train_id, c.eval_id
),
scored AS (
  SELECT train_id, eval_id,
         CAST(floor(CAST(nc AS DOUBLE) / (sa.n_sh + sb.n_sh - nc)
                    * 1000000 + 0.5) AS BIGINT) AS jaccard_micro
  FROM common
  JOIN sizes sa ON sa.doc_id = train_id
  JOIN sizes sb ON sb.doc_id = eval_id
  WHERE CAST(nc AS DOUBLE) / (sa.n_sh + sb.n_sh - nc) >= {_DECON_T}
)
SELECT train_id AS doc_id, eval_id AS matched_eval, jaccard_micro
FROM scored
QUALIFY row_number() OVER (
  PARTITION BY train_id ORDER BY jaccard_micro DESC, eval_id
) = 1
"""


@register("tp_decontaminate_fuzzy", _decon_fuzzy_oracle())
def tp_decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY benchmark decontamination: find training docs that are
    near-duplicates (shingle Jaccard >= {t}) of any held-out eval doc —
    the hygiene pass exact n-gram overlap (``tp_contamination_check``)
    misses when the leaked copy was lightly paraphrased or re-wrapped.
    Returns one row per contaminated train doc with its best-matching
    eval doc (max Jaccard, ties to the lowest eval id) — the drop list a
    release pipeline anti-joins against the corpus.

    Candidate generation is the ASYMMETRIC MinHash-LSH band join
    (``dedup_incremental_lsh``'s posture): the eval side is bounded by
    construction (benchmarks, 10% of keyspace here), so its band table
    broadcasts and the corpus-sized train band table is probed with NO
    shuffle of the train side; exact-Jaccard verification then touches
    only candidate docs' shingles (hash equality stands in for string
    equality w.h.p., the ``dedup_ngram_jaccard`` convention). At 100 TB
    a degenerate band bucket bounds fan-out at |train-bucket| x |eval|,
    linear in the bucket — no quadratic blowup to cap.

    Per-train-doc argmax runs as a window over candidate matches only
    (<= |eval| rows per train doc, never corpus-wide)."""
    from ntd_gtfs_to_socrata_spark.queries.dedup_text import dedup_minhash

    docs = ensure_min_parallelism(load_table(spark, sf_dir, "documents"))
    sigs = dedup_minhash(spark, sf_dir)
    bands = sigs.select(
        "doc_id",
        *[
            F.concat_ws(
                "_", F.lit(i), F.col(f"mh{2 * i}"), F.col(f"mh{2 * i + 1}")
            ).alias(f"band{i}")
            for i in range(4)
        ],
    ).selectExpr("doc_id", "stack(4, band0, band1, band2, band3) AS bucket")
    # the train/eval branches would each re-execute the corpus-sized
    # signature aggregation (measured r8: 8 executed / 0 reused before
    # this boundary) — materialize the small (doc_id, bucket) frame once.
    # stage_boundary (lazy persist) instead of eager localCheckpoint: the
    # materialization rides the first consuming job rather than running a
    # separate plan-construction-time job per bench pass — one fewer job
    # whose scheduling stall on a contended box can land inside a timed
    # pass (r10 driver artifact: [2.0, 23.2] s spread vs 3.1 s local)
    from ntd_gtfs_to_socrata_spark.operators.stagecache import stage_boundary

    bands = stage_boundary(bands, "tp_decon_bands")
    is_eval = _bucket() >= _DECON_EVAL_BUCKET
    split = docs.select("doc_id", is_eval.alias("is_eval"))
    tr_bands = bands.join(
        split.filter(~F.col("is_eval")).select("doc_id"), "doc_id"
    ).select(F.col("doc_id").alias("train_id"), "bucket")
    ev_bands = bands.join(
        split.filter(F.col("is_eval")).select("doc_id"), "doc_id"
    ).select(F.col("doc_id").alias("eval_id"), "bucket")
    cand = (
        tr_bands.join(F.broadcast(ev_bands), "bucket")
        .select("train_id", "eval_id")
        .distinct()
    )
    shingled = docs.select(
        "doc_id", TX.word_shingles(TX.tokens(F.col("text"))).alias("sh")
    ).select(
        "doc_id", F.size("sh").alias("n_sh"), F.explode("sh").alias("s")
    ).select("doc_id", "n_sh", F.xxhash64("s").alias("h"))
    a = shingled.select(
        F.col("doc_id").alias("train_id"), F.col("n_sh").alias("na"), "h"
    )
    b = shingled.select(
        F.col("doc_id").alias("eval_id"), F.col("n_sh").alias("nb"), "h"
    )
    common = (
        cand.join(a, "train_id")
        .join(b, ["eval_id", "h"])
        .groupBy("train_id", "eval_id", "na", "nb")
        .agg(F.count(F.lit(1)).alias("nc"))
    )
    jac = F.col("nc").cast("double") / (
        F.col("na") + F.col("nb") - F.col("nc")
    )
    scored = common.filter(jac >= F.lit(_DECON_T)).select(
        "train_id",
        "eval_id",
        F.floor(jac * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("jaccard_micro"),
    )
    w = Window.partitionBy("train_id").orderBy(
        F.col("jaccard_micro").desc(), F.col("eval_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("train_id").alias("doc_id"),
            F.col("eval_id").alias("matched_eval"),
            "jaccard_micro",
        )
    )


tp_decontaminate_fuzzy.__doc__ = tp_decontaminate_fuzzy.__doc__.format(
    t=_DECON_T
)


# ---------------------------------------------------------------------------
# Near-dup-aware (leakage-free) train/validation/test split
# ---------------------------------------------------------------------------

def _cluster_split_oracle() -> str:
    from ntd_gtfs_to_socrata_spark.queries.dedup_text import (
        AUDIT_DF_CAP,
        _ngram_oracle,
    )

    return f"""
WITH RECURSIVE pairs_j AS MATERIALIZED ({_ngram_oracle(df_cap=AUDIT_DF_CAP)}),
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs_j
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs_j
),
reach(node, root) AS (
  SELECT DISTINCT src AS node, src AS root FROM edges
  UNION
  SELECT e.dst AS node, r.root AS root FROM reach r JOIN edges e ON e.src = r.node
),
comp AS MATERIALIZED (
  SELECT node AS doc_id, min(root) AS component_id FROM reach GROUP BY node
),
grouped AS (
  SELECT d.doc_id, coalesce(c.component_id, d.doc_id) AS group_id
  FROM documents d LEFT JOIN comp c USING (doc_id)
),
b AS (
  SELECT doc_id, group_id,
         CAST('0x' || substr(md5(CAST(group_id AS VARCHAR)), 1, 4) AS INTEGER)
           % 100 AS bucket
  FROM grouped
)
SELECT doc_id, group_id,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'validation'
            ELSE 'test' END AS split
FROM b
"""


@register("tp_cluster_aware_split", _cluster_split_oracle())
def tp_cluster_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free split: hash on the NEAR-DUP CLUSTER id, not the doc
    id. [[tp_hash_split]] keyed on doc_id puts two near-duplicate
    documents in different splits with probability ~28% per pair — eval
    contamination by construction. Here near-dup pairs (shingle Jaccard,
    the [[dedup_ngram_jaccard_dfcap]] edge set) are closed into
    components; every doc inherits group_id = its component (or itself
    when unclustered), and the 80/10/10 bucket is md5(group_id) — so a
    whole near-dup cluster lands in ONE split, while singleton docs
    bucket exactly like the plain hash split. The per-doc assignment
    (not just counts) is value-hash checked against a recursive-CTE
    fixpoint oracle.

    Scale posture: the pair/CC stages are the linear banded pipeline
    from dedup_text (posting lists, never all-pairs; O(log n) CC
    rounds); the component map joins back to the corpus as a plain
    keyed join AQE can split (dup-heavy web corpora can have a
    corpus-scale map, so no forced broadcast); the bucket + split
    labels are pure map expressions. No shuffle is added beyond the
    one component-map join."""
    from ntd_gtfs_to_socrata_spark.operators.graph import connected_components
    from ntd_gtfs_to_socrata_spark.queries.dedup_text import (
        AUDIT_DF_CAP,
        _ngram_jaccard,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = _ngram_jaccard(spark, sf_dir, df_cap=AUDIT_DF_CAP)
    cc = connected_components(pairs, src="doc_a", dst="doc_b").select(
        F.col("node").alias("doc_id"), "component_id"
    )
    grouped = docs.join(cc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("component_id", "doc_id").alias("group_id"),
    )
    bucket = _bucket(F.col("group_id"))
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("validation"))
        .otherwise(F.lit("test"))
    )
    return grouped.withColumn("split", split)
