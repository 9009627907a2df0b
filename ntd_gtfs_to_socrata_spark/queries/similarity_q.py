"""Similarity search over the ``embeddings`` table (north-star extension).

Brute-force cosine top-k as the exact baseline, and a hyperplane-LSH
bucketing as the scale path (candidate generation O(n) instead of O(n·q)).
All vector math is JVM-side higher-order functions (zip_with/aggregate) on
array columns — Arrow/pandas never enters the hot path.
"""

from __future__ import annotations

from uuid import uuid4

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.io import ensure_min_parallelism, load_table
from ntd_gtfs_to_socrata_spark.queries import register

DIM = 64


def dot(a: Column, b: Column) -> Column:
    """Double-precision dot product of two float-array columns, sequential
    left-to-right fold (matches DuckDB's list_inner_product order)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


# ---------------------------------------------------------------------------
# Brute-force cosine top-k
# ---------------------------------------------------------------------------

BRUTE_ORACLE = """
WITH q AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS qe,
         sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS qn
  FROM embeddings WHERE vec_id % 50 = 0
),
c AS (
  SELECT vec_id AS cid, label, embedding::DOUBLE[] AS ce,
         sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS cn
  FROM embeddings
),
scored AS (
  SELECT qid, cid, label,
         round(list_inner_product(qe, ce) / (qn * cn), 6) AS cosine
  FROM q JOIN c ON qid <> cid
),
ranked AS (
  SELECT qid, cid, label, cosine,
         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rnk
  FROM scored
)
SELECT qid, cid, label, cosine, rnk FROM ranked WHERE rnk <= 10
"""


@register("sim_bruteforce_topk", BRUTE_ORACLE)
def sim_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 per query vector: broadcast the (small) query
    set against the full corpus — map-side cross product, per-query top-k
    via window (WindowGroupLimit keeps k rows per partition through the
    shuffle). At 100 TB the corpus side stays partitioned; only queries
    broadcast. Cosine rounded to 6dp BEFORE ranking so ordering is
    FP-noise-proof and the cid tiebreak is deterministic."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = (
        emb.filter(F.col("vec_id") % 50 == 0)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qe"),
            l2_norm(F.col("embedding")).alias("qn"),
        )
    )
    # corpus side carries the per-candidate scoring work — make sure the
    # broadcast-nested-loop runs over a parallel corpus scan
    c = ensure_min_parallelism(emb).select(
        F.col("vec_id").alias("cid"),
        "label",
        F.col("embedding").alias("ce"),
        l2_norm(F.col("embedding")).alias("cn"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            "label",
            F.round(dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn")), 6).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid").asc())
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 10)


# ---------------------------------------------------------------------------
# Hyperplane-LSH bucketing (the ANN scale path)
# ---------------------------------------------------------------------------

N_PLANES = 8


def _plane_weights(p: int) -> list[int]:
    """Deterministic pseudo-random hyperplane: w[d] = ((p*31 + d*17) % 7) - 3
    (integer weights, engine-portable — no RNG state to reproduce)."""
    return [((p * 31 + d * 17) % 7) - 3 for d in range(DIM)]


# The SQL rendering of the 8-plane bucket id, generated ONCE from the
# same _plane_weights the Spark side uses — every oracle that buckets
# interpolates this constant, so the hyperplane definition cannot drift
# between oracles (or between oracle and operator).
_BUCKET_SQL = " + ".join(
    "(CASE WHEN list_inner_product(embedding::DOUBLE[], [{w}]::DOUBLE[]) >= 0 "
    "THEN {bit} ELSE 0 END)".format(
        w=", ".join(str(x) for x in _plane_weights(p)), bit=1 << p
    )
    for p in range(N_PLANES)
)

LSH_ORACLE = f"""
SELECT vec_id, label, {_BUCKET_SQL} AS bucket
FROM embeddings
"""


def _bucket_col(emb_col: Column) -> Column:
    """The 8-plane LSH bucket id as a Column over the RAW (float-array)
    embedding — the single definition every consumer shares, so a query
    that needs (bucket, embedding) together computes both in ONE map pass
    over the scan instead of joining ``sim_lsh_buckets`` back to the
    embeddings table (r14, guide §2.4: that self-join cost an extra scan
    plus a broadcast/shuffle exchange at six call sites for a column the
    map stage had just projected away)."""
    bucket = F.lit(0)
    for p in range(N_PLANES):
        w_arr = F.array(*[F.lit(float(x)) for x in _plane_weights(p)])
        bit = F.when(dot(emb_col, w_arr) >= 0, F.lit(1 << p)).otherwise(0)
        bucket = bucket + bit
    return bucket


@register("sim_lsh_hyperplane_buckets", LSH_ORACLE)
def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH: 8 sign bits → 256 buckets. ANN search then
    joins query buckets to corpus buckets (plus Hamming-1 neighbors for
    recall) — candidate generation is a hash-partitioned equi-join, O(n),
    instead of the brute-force O(n·q) cross product. Map-only here; the
    bucket id is the shuffle key downstream."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", "label", _bucket_col(F.col("embedding")).alias("bucket"))


# ---------------------------------------------------------------------------
# LSH-bucketed ANN top-k (bucket join + exact re-rank within candidates)
# ---------------------------------------------------------------------------


ANN_TOPK_ORACLE = """
WITH b AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS e, {bucket} AS bucket
  FROM embeddings
),
q AS (SELECT vec_id AS qid, e AS qe, bucket AS qb FROM b WHERE vec_id % 50 = 0),
scored AS (
  SELECT qid, b.vec_id AS cid, b.label,
         round(list_inner_product(qe, b.e), 6) AS cosine
  FROM q JOIN b ON q.qb = b.bucket AND q.qid <> b.vec_id
),
ranked AS (
  SELECT qid, cid, label, cosine,
         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rnk
  FROM scored
)
SELECT qid, cid, label, cosine, rnk FROM ranked WHERE rnk <= 5
""".format(bucket=_BUCKET_SQL)


@register("sim_ann_bucketed_topk", ANN_TOPK_ORACLE)
def sim_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN: candidates = corpus vectors sharing the query's LSH bucket,
    re-ranked by exact cosine, top-5. The two-stage shape (cheap hash join
    for candidates → exact scoring on the small candidate set) is the
    100 TB pattern. The hyperplanes are deterministic integer weights, so
    the whole candidate-and-rerank result is value-hash checked; recall
    vs brute force is separately asserted in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    # bucket + embedding in one map pass (no self-join; see _bucket_col)
    with_vec = emb.select(
        "vec_id", "label", "embedding", _bucket_col(F.col("embedding")).alias("bucket")
    )
    q = with_vec.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("bucket").alias("qbucket"),
    )
    c = with_vec.select(
        F.col("vec_id").alias("cid"),
        F.col("label").alias("label"),
        F.col("embedding").alias("ce"),
        F.col("bucket").alias("cbucket"),
    )
    cand = F.broadcast(q).join(
        c, (F.col("qbucket") == F.col("cbucket")) & (F.col("qid") != F.col("cid"))
    )
    scored = cand.select(
        "qid",
        "cid",
        "label",
        F.round(dot(F.col("qe"), F.col("ce")), 6).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid").asc())
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 5)


# ---------------------------------------------------------------------------
# IVF (inverted-file) coarse quantization — the other ANN scale path
# ---------------------------------------------------------------------------

N_CELLS = 16
N_PROBE = 2


def _centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic coarse quantizer: the first N_CELLS corpus vectors act
    as centroids (a real deployment k-means-trains these on a sample; the
    partition/assignment/probe plan shape is identical and that is what the
    engine owns)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid"),
        l2_norm(F.col("embedding")).alias("centroid_norm"),
    )


IVF_ASSIGN_ORACLE = f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS ce,
         sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS cn
  FROM embeddings WHERE vec_id < {N_CELLS}
),
scored AS (
  SELECT v.vec_id, v.label, c.centroid_id,
         round(list_inner_product(v.embedding::DOUBLE[], c.ce)
               / (sqrt(list_inner_product(v.embedding::DOUBLE[], v.embedding::DOUBLE[])) * c.cn),
               6) AS cosine,
         row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY round(list_inner_product(v.embedding::DOUBLE[], c.ce)
                                           / (sqrt(list_inner_product(v.embedding::DOUBLE[], v.embedding::DOUBLE[])) * c.cn), 6) DESC,
                                     c.centroid_id ASC) AS rnk
  FROM embeddings v CROSS JOIN cent c
)
SELECT vec_id, label, centroid_id, cosine AS centroid_cosine
FROM scored WHERE rnk = 1
"""


@register("sim_ivf_assign", IVF_ASSIGN_ORACLE)
def sim_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell assignment: nearest centroid by cosine, deterministic
    tiebreak on centroid_id. The centroid table broadcasts (tiny, always —
    even a 65k-cell quantizer is a few MB) so assignment is a map-only
    stage over the corpus: the 100 TB-safe shape. Downstream, the corpus is
    written partitioned/bucketed by centroid_id so a probe reads only
    nprobe cells (partition pruning)."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id", "label", F.col("embedding").alias("ve"), l2_norm(F.col("embedding")).alias("vn")
    )
    scored = v.join(F.broadcast(_centroids(spark, sf_dir))).select(
        "vec_id",
        "label",
        "centroid_id",
        F.round(
            dot(F.col("ve"), F.col("centroid")) / (F.col("vn") * F.col("centroid_norm")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), F.col("centroid_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("vec_id", "label", "centroid_id", F.col("cosine").alias("centroid_cosine"))
    )


IVF_TOPK_ORACLE = f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS ce,
         sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS cn
  FROM embeddings WHERE vec_id < {N_CELLS}
),
assign_scored AS (
  SELECT v.vec_id, c.centroid_id,
         row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY round(list_inner_product(v.embedding::DOUBLE[], c.ce)
                                           / (sqrt(list_inner_product(v.embedding::DOUBLE[], v.embedding::DOUBLE[])) * c.cn), 6) DESC,
                                     c.centroid_id ASC) AS rnk
  FROM embeddings v CROSS JOIN cent c
),
assigned AS (SELECT vec_id, centroid_id FROM assign_scored WHERE rnk = 1),
q AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS qe,
         sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS qn
  FROM embeddings WHERE vec_id % 50 = 0
),
q_probe AS (
  SELECT qid, qe, qn, centroid_id FROM (
    SELECT q.qid, q.qe, q.qn, c.centroid_id,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY round(list_inner_product(q.qe, c.ce) / (q.qn * c.cn), 6) DESC,
                                       c.centroid_id ASC) AS rnk
    FROM q CROSS JOIN cent c) t
  WHERE rnk <= {N_PROBE}
),
corpus AS (
  SELECT e.vec_id AS cid, e.label, e.embedding::DOUBLE[] AS ce,
         sqrt(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) AS cn,
         a.centroid_id
  FROM embeddings e JOIN assigned a ON e.vec_id = a.vec_id
),
scored AS (
  SELECT p.qid, c.cid, c.label,
         round(list_inner_product(p.qe, c.ce) / (p.qn * c.cn), 6) AS cosine
  FROM q_probe p JOIN corpus c ON p.centroid_id = c.centroid_id AND p.qid <> c.cid
),
ranked AS (
  SELECT qid, cid, label, cosine,
         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rnk
  FROM scored
)
SELECT qid, cid, label, cosine, rnk FROM ranked WHERE rnk <= 5
"""


@register("sim_ivf_topk", IVF_TOPK_ORACLE)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe: each query searches only its N_PROBE nearest cells —
    candidates come from an equi-join on centroid_id (partition-pruned read
    when the corpus is stored partitioned by cell), then exact cosine
    re-rank, top-5. The deterministic coarse quantizer (first N_CELLS
    vectors) makes the whole probe-and-rerank result value-hash checkable;
    recall vs brute force is separately asserted in
    tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned = sim_ivf_assign(spark, sf_dir).select("vec_id", "centroid_id")
    corpus = emb.join(assigned, "vec_id").select(
        F.col("vec_id").alias("cid"),
        "label",
        F.col("embedding").alias("ce"),
        l2_norm(F.col("embedding")).alias("cn"),
        F.col("centroid_id").alias("c_cell"),
    )
    # query-side: top-N_PROBE cells per query vector
    v = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        l2_norm(F.col("embedding")).alias("qn"),
    )
    q_scored = v.join(F.broadcast(_centroids(spark, sf_dir))).select(
        "qid",
        "qe",
        "qn",
        "centroid_id",
        F.round(
            dot(F.col("qe"), F.col("centroid")) / (F.col("qn") * F.col("centroid_norm")), 6
        ).alias("ccos"),
    )
    wq = Window.partitionBy("qid").orderBy(F.col("ccos").desc(), F.col("centroid_id").asc())
    probes = (
        q_scored.withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") <= N_PROBE)
        .select("qid", "qe", "qn", F.col("centroid_id").alias("c_cell"))
    )
    cand = F.broadcast(probes).join(corpus, "c_cell").filter(F.col("qid") != F.col("cid"))
    scored = cand.select(
        "qid",
        "cid",
        "label",
        F.round(dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn")), 6).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid").asc())
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 5)


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs
# ---------------------------------------------------------------------------

NEARDUP_ORACLE = """
WITH v AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS e,
         sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n
  FROM embeddings WHERE vec_id < 200
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_inner_product(a.e, b.e) / (a.n * b.n), 6) AS cosine
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE round(list_inner_product(a.e, b.e) / (a.n * b.n), 6) >= 0.3
"""


@register("sim_cosine_neardup_pairs", NEARDUP_ORACLE)
def sim_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: all pairs ≥ 0.3 within a bounded slice
    (exact, oracle-checkable). The unbounded version routes through the LSH
    buckets first — same scoring expression, candidate join instead of
    cross join."""
    v = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 200)
        .select(
            "vec_id",
            "label",
            F.col("embedding").alias("e"),
            l2_norm(F.col("embedding")).alias("n"),
        )
    )
    a = v.select(
        F.col("vec_id").alias("id_a"), F.col("e").alias("ea"), F.col("n").alias("na")
    )
    b = v.select(
        F.col("vec_id").alias("id_b"), F.col("e").alias("eb"), F.col("n").alias("nb")
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b")).select(
        "id_a",
        "id_b",
        F.round(dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6).alias(
            "cosine"
        ),
    )
    return pairs.filter(F.col("cosine") >= 0.3)


# ---------------------------------------------------------------------------
# K-means centroid training (Lloyd iterations) — the iterative-algorithm path
# ---------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 3


def _nearest_cid(cents: list[tuple[int, list[float]]]) -> Column:
    """Map-side argmin over literal centroids: build the K centroids as a
    literal array<struct<cid, c>>, compute struct(dist, cid) per centroid,
    and take array_min — struct ordering compares dist first then cid, so
    the tiebreak (lowest cid) is deterministic and the whole assignment is
    a single codegen'd expression: NO join, NO shuffle, NO per-vector
    window. K·dim literals stay tiny (even 65k cells ≈ MBs, still fine as
    a broadcast variable; literals suffice at quantizer sizes here)."""
    carr = F.array(
        *[
            F.struct(
                F.lit(cid).alias("cid"),
                F.array(*[F.lit(float(v)) for v in vec]).alias("c"),
            )
            for cid, vec in cents
        ]
    )
    scored = F.transform(
        carr,
        lambda s: F.struct(
            F.aggregate(
                F.zip_with(F.col("e"), s.getField("c"), lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
            s.getField("cid").alias("cid"),
        ),
    )
    return F.array_min(scored).getField("cid")


@register("sim_kmeans_train")  # rows-only: iterative, not SQL-expressible
def sim_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd k-means over the embedding corpus: deterministic init (first
    K vectors), KMEANS_ITERS iterations of assign → recompute means. This
    trains the IVF coarse quantizer that `sim_ivf_assign` consumes fixed.
    Verified against an identically-seeded NumPy reference in
    tests/test_similarity.py (not SQL-expressible → rows-only in the gate).

    Scale posture (the MLlib shape): assignment is a map-only expression
    (see _nearest_cid — no join, no shuffle); per-dimension means go
    explode → groupBy(cluster, pos), which shuffles only K·dim partial
    (sum, count) pairs thanks to map-side partial aggregation, NOT the
    corpus. Only K·dim aggregated doubles reach the driver per iteration;
    the corpus is scanned KMEANS_ITERS+1 times and never collected.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    cents = [
        (int(r["vec_id"]), list(r["e"]))
        for r in emb.filter(F.col("vec_id") < KMEANS_K).collect()
    ]
    for _ in range(KMEANS_ITERS):
        assigned = emb.select(_nearest_cid(cents).alias("cid"), "e")
        means = (
            assigned.select("cid", F.posexplode("e").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cid", F.col("pm.m").alias("c"))
        )
        new = {r["cid"]: list(r["c"]) for r in means.collect()}
        # empty clusters keep their previous centroid
        cents = [(cid, new.get(cid, c)) for cid, c in cents]
    counts = (
        emb.select(_nearest_cid(cents).alias("cluster_id"))
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_members"))
    )
    final = spark.createDataFrame(cents, "cluster_id INT, centroid ARRAY<DOUBLE>")
    return (
        final.join(counts, "cluster_id", "left")
        .select(
            "cluster_id",
            F.transform("centroid", lambda x: F.round(x, 6)).alias("centroid"),
            F.coalesce("n_members", F.lit(0)).alias("n_members"),
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# IVF recall, self-measured inside the engine
# ---------------------------------------------------------------------------

@register("sim_ivf_recall")  # rows-only: depends on sketch-free but param-defined ANN
def sim_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF path against exact brute force, computed AS A
    QUERY: join the two top-k sets per query vector, count overlap, return
    one row (n_queries, mean_recall, min_recall). 'Measure, don't guess'
    applied to the engine's own approximation — at 100 TB this runs on a
    sampled query set as the continuous quality monitor next to the ANN
    serving path (tests/test_similarity.py asserts the same measure ≥ 0.2
    at fixture scale — with nprobe=2 of 16 cells over near-random fixture
    embeddings, ~0.3 recall@10 is the expected operating point; recall is
    bought by raising N_PROBE, which scales scan cost linearly).

    Plan shape: both top-k frames are per-query tiny; the overlap join is
    on (qid, cid) and aggregates straight down to one row."""
    exact = sim_bruteforce(spark, sf_dir).select(
        F.col("qid").alias("e_qid"), F.col("cid").alias("e_cid")
    )
    approx = sim_ivf_topk(spark, sf_dir).select(
        F.col("qid").alias("a_qid"), F.col("cid").alias("a_cid")
    )
    hits = exact.join(
        approx,
        (F.col("e_qid") == F.col("a_qid")) & (F.col("e_cid") == F.col("a_cid")),
        "left",
    ).groupBy("e_qid").agg(
        (F.sum(F.col("a_cid").isNotNull().cast("int")) / F.count(F.lit(1))).alias(
            "recall"
        )
    )
    return hits.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.avg("recall"), 4).alias("mean_recall"),
        F.round(F.min("recall"), 4).alias("min_recall"),
    )


# ---------------------------------------------------------------------------
# Embedding-level dedup verdict: cosine pairs → components → keep-one
# ---------------------------------------------------------------------------

EMB_KEEP_ONE_ORACLE = """
WITH RECURSIVE v AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n
  FROM embeddings WHERE vec_id < 200
),
pairs_c AS MATERIALIZED (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM v a JOIN v b ON a.vec_id < b.vec_id
  WHERE round(list_inner_product(a.e, b.e) / (a.n * b.n), 6) >= 0.3
),
edges AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM pairs_c
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs_c
),
reach(node, root) AS (
  SELECT DISTINCT src AS node, src AS root FROM edges
  UNION
  SELECT e.dst AS node, r.root AS root FROM reach r JOIN edges e ON e.src = r.node
),
cc AS (SELECT node, min(root) AS comp FROM reach GROUP BY node)
SELECT vv.vec_id,
       coalesce(cc.comp, vv.vec_id) AS component_id,
       (coalesce(cc.comp, vv.vec_id) = vv.vec_id) AS kept
FROM v vv LEFT JOIN cc ON vv.vec_id = cc.node
"""


@register("sim_embedding_dedup_keep_one", EMB_KEEP_ONE_ORACLE)
def sim_embedding_dedup_keep_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup closed end-to-end at the EMBEDDING level: cosine
    near-dup pairs → connected components (operators/graph.py) → one
    representative per semantic cluster — the same pairs→clusters→verdict
    pipeline as [[dedup_keep_one_per_cluster]], proving the graph operator
    is modality-agnostic. At 100 TB the pair stage routes through LSH
    buckets / IVF cells instead of the bounded exact cross join."""
    from ntd_gtfs_to_socrata_spark.operators.graph import connected_components

    pairs = sim_neardup_pairs(spark, sf_dir).select("id_a", "id_b")
    cc = connected_components(pairs, src="id_a", dst="id_b").select(
        F.col("node"), F.col("component_id").alias("comp")
    )
    vecs = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 200)
        .select("vec_id")
    )
    comp = F.coalesce(F.col("comp"), F.col("vec_id"))
    return vecs.join(cc, vecs.vec_id == cc.node, "left").select(
        "vec_id",
        comp.alias("component_id"),
        (comp == F.col("vec_id")).alias("kept"),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN — the memory-compression scale path
# ---------------------------------------------------------------------------

N_SUB = 4        # subspaces (DIM=64 → 4 x 16-dim subvectors)
SUB_DIM = DIM // N_SUB
N_CODES = 16     # codewords per subspace (PQ code = 4 x 4 bits here)


def _sq_l2(a: Column, b: Column) -> Column:
    """Squared L2 via inner products only — ``|a|² - 2a·b + |b|²`` — so the
    DuckDB oracle (which has list_inner_product but no elementwise list
    subtraction) computes the bit-identical double-precision value."""
    return dot(a, a) - 2 * dot(a, b) + dot(b, b)


def _sq_l2_hoisted(a_n2: Column, a: Column, b: Column, b_n2: Column) -> Column:
    """``_sq_l2`` with both squared norms precomputed: callers scoring a
    JOIN of two sides hoist ``dot(a,a)`` / ``dot(b,b)`` to a projection
    below the join (once per input row) so each joined row evaluates ONE
    higher-order dot instead of three — measured 2.7s → 1.1s on the PQ
    encode at sf0.1. Same left-to-right float addition order as _sq_l2
    ⇒ bit-identical doubles, so the shared oracle SQL is unchanged."""
    return a_n2 - 2 * dot(a, b) + b_n2


def _pq_oracle() -> str:
    sub = f"(SELECT unnest(range({N_SUB})) AS s)"
    l2 = (
        "round(list_inner_product({a}, {a}) - 2 * list_inner_product({a}, {b})"
        " + list_inner_product({b}, {b}), 6)"
    )
    return f"""
WITH cb AS (
  SELECT vec_id AS code, sub.s AS s,
         list_slice(embedding::DOUBLE[], sub.s * {SUB_DIM} + 1, sub.s * {SUB_DIM} + {SUB_DIM}) AS cvec
  FROM embeddings, {sub} sub WHERE vec_id < {N_CODES}
),
corpus_sub AS (
  SELECT vec_id AS cid, label, sub.s AS s,
         list_slice(embedding::DOUBLE[], sub.s * {SUB_DIM} + 1, sub.s * {SUB_DIM} + {SUB_DIM}) AS svec
  FROM embeddings, {sub} sub
),
code_scored AS (
  SELECT cid, label, c.s, c.code,
         row_number() OVER (PARTITION BY cid, c.s
                            ORDER BY {l2.format(a='svec', b='cvec')} ASC, c.code ASC) AS rn
  FROM corpus_sub j JOIN cb c ON j.s = c.s
),
codes AS (SELECT cid, label, s, code FROM code_scored WHERE rn = 1),
q_sub AS (
  SELECT vec_id AS qid, sub.s AS s,
         list_slice(embedding::DOUBLE[], sub.s * {SUB_DIM} + 1, sub.s * {SUB_DIM} + {SUB_DIM}) AS qvec
  FROM embeddings, {sub} sub WHERE vec_id % 50 = 0
),
adc AS (
  SELECT qid, c.s, c.code, {l2.format(a='qvec', b='cvec')} AS qd
  FROM q_sub q JOIN cb c ON q.s = c.s
),
scored AS (
  SELECT qid, cid, label, round(sum(qd), 6) AS approx_d2
  FROM codes k JOIN adc a ON k.s = a.s AND k.code = a.code
  WHERE qid <> cid
  GROUP BY qid, cid, label
),
ranked AS (
  SELECT qid, cid, label, approx_d2,
         row_number() OVER (PARTITION BY qid ORDER BY approx_d2 ASC, cid ASC) AS rnk
  FROM scored
)
SELECT qid, cid, label, approx_d2, rnk FROM ranked WHERE rnk <= 5
"""


PQ_TOPK_ORACLE = _pq_oracle()


def _pq_subvectors(df: DataFrame, id_alias: str, vec_alias: str, *extra: str) -> DataFrame:
    """Explode an embedding into its N_SUB subvectors: (id, s, subvec)."""
    subs = F.array(*[F.slice("embedding", s * SUB_DIM + 1, SUB_DIM) for s in range(N_SUB)])
    return df.select(
        F.col("vec_id").alias(id_alias),
        *extra,
        F.posexplode(subs).alias("s", vec_alias),
    )


@register("sim_pq_topk", PQ_TOPK_ORACLE)
def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: the corpus is compressed to N_SUB codes of
    log2(N_CODES) bits each (64 dims x 4 bytes → 4 x 4 bits, a 128x memory
    cut); queries score candidates through an ADC lookup table (per-subspace
    squared-L2 to every codeword) instead of touching raw vectors.

    Deterministic codebook (subvectors of the first N_CODES corpus vectors —
    a real deployment k-means-trains each subspace exactly like
    [[sim_kmeans_train]]) keeps encode + probe value-hash checkable.

    Scale posture: the codebook (N_SUB·N_CODES subvectors) and the ADC table
    (queries x N_SUB x N_CODES floats) BROADCAST; corpus encoding is a
    map-side broadcast join + per-(vector, subspace) argmin that runs ONCE
    at ingest and persists as a 2-byte-per-vector code table; the probe
    scan reads only (cid, codes) — at 100 TB the raw float corpus is never
    re-scanned at query time, which is the entire point of PQ."""
    emb = load_table(spark, sf_dir, "embeddings")
    cb = _pq_subvectors(emb.filter(F.col("vec_id") < N_CODES), "code", "cvec").withColumn(
        "cvec_n2", dot(F.col("cvec"), F.col("cvec"))
    )
    corpus = _pq_subvectors(ensure_min_parallelism(emb), "cid", "svec", "label").withColumn(
        "svec_n2", dot(F.col("svec"), F.col("svec"))
    )
    d2 = F.round(
        _sq_l2_hoisted(F.col("svec_n2"), F.col("svec"), F.col("cvec"), F.col("cvec_n2")), 6
    )
    # argmin via min(struct(d2, code)) — lexicographic struct ordering IS
    # "lowest d2, tie to lowest code" (the window row_number()=1 row),
    # with map-side partial aggregation instead of a per-(cid, s)
    # partition sort
    codes = (
        corpus.join(F.broadcast(cb), "s")
        .groupBy("cid", "label", "s")
        .agg(F.min(F.struct(d2.alias("d2"), F.col("code").alias("code"))).alias("m"))
        .select("cid", "label", "s", F.col("m.code").alias("code"))
    )
    q = _pq_subvectors(emb.filter(F.col("vec_id") % 50 == 0), "qid", "qvec").withColumn(
        "qvec_n2", dot(F.col("qvec"), F.col("qvec"))
    )
    adc = q.join(F.broadcast(cb), "s").select(
        "qid",
        "s",
        "code",
        F.round(
            _sq_l2_hoisted(F.col("qvec_n2"), F.col("qvec"), F.col("cvec"), F.col("cvec_n2")), 6
        ).alias("qd"),
    )
    scored = (
        codes.join(F.broadcast(adc), ["s", "code"])
        .filter(F.col("qid") != F.col("cid"))
        .groupBy("qid", "cid", "label")
        .agg(F.round(F.sum("qd"), 6).alias("approx_d2"))
    )
    wr = Window.partitionBy("qid").orderBy(F.col("approx_d2").asc(), F.col("cid").asc())
    return scored.withColumn("rnk", F.row_number().over(wr)).filter(F.col("rnk") <= 5)


# ---------------------------------------------------------------------------
# Matryoshka prefix-dimension screen + full-dim rerank
# ---------------------------------------------------------------------------

_MRL_DIM = 16  # screening prefix (Matryoshka front-loaded dims)
_MRL_CAND = 50  # candidates kept per query for the full-dim rerank

MRL_ORACLE = f"""
WITH q AS MATERIALIZED (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS qe,
         embedding[1:{_MRL_DIM}]::DOUBLE[] AS qp,
         sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS qen,
         sqrt(list_inner_product(embedding[1:{_MRL_DIM}]::DOUBLE[],
                                 embedding[1:{_MRL_DIM}]::DOUBLE[])) AS qpn
  FROM embeddings WHERE vec_id % 50 = 0
),
c AS MATERIALIZED (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS ce,
         embedding[1:{_MRL_DIM}]::DOUBLE[] AS cp,
         sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS cen,
         sqrt(list_inner_product(embedding[1:{_MRL_DIM}]::DOUBLE[],
                                 embedding[1:{_MRL_DIM}]::DOUBLE[])) AS cpn
  FROM embeddings
),
-- norms precomputed ONCE per vector (r12): the 50M screening pairs each
-- re-derived both prefix norms inline, tripling the oracle's inner-
-- product count; sqrt of the same double times the same double is
-- bit-identical, so the rounded cosine — and the value hash — cannot move
-- rank BARE (qid, cid) and re-join the arrays afterwards: carrying the
-- full-dim vectors through the (queries x corpus)-row window sort was
-- the 117 s sf1 oracle tail (r11) — the MMR oracle's memory-shape
-- lesson applied here; q/c MATERIALIZED since both now have 2 readers
screened AS (
  SELECT qid, cid,
         row_number() OVER (
           PARTITION BY qid
           ORDER BY round(list_inner_product(qp, cp)
                          / (qpn * cpn), 6) DESC,
                    cid ASC) AS prank
  FROM q JOIN c ON qid <> cid
),
cand AS MATERIALIZED (
  SELECT qid, cid FROM screened WHERE prank <= {_MRL_CAND}
),
reranked AS (
  SELECT cand.qid, cand.cid,
         round(list_inner_product(qe, ce) / (qen * cen), 6) AS cosine
  FROM cand JOIN q ON q.qid = cand.qid JOIN c ON c.cid = cand.cid
)
SELECT qid, cid, cosine,
       row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rnk
FROM reranked
QUALIFY rnk <= 10
"""


@register("sim_matryoshka_topk", MRL_ORACLE)
def sim_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-representation search (Kusupati et al.): screen with the
    FIRST 16 dimensions only (MRL training front-loads information into
    prefixes), keep 50 candidates per query, rerank the survivors with
    full 64-dim cosine. A 4× cheaper screening pass that touches every
    candidate, then exact scoring on a constant-size set.

    Scale posture: the screen is the same broadcast-queries×corpus map as
    sim_bruteforce_topk but over ¼ of the floats (at 100 TB, store the
    prefix as its own column so the screen scan reads ¼ the bytes;
    column pruning then keeps full vectors out of the screen entirely).
    WindowGroupLimit caps per-partition state at 50 rows/query before the
    shuffle, and the rerank's input is bounded at queries×50 rows — the
    full-dim vectors for rerank come from a bounded self-join back to the
    corpus, never a second full scan in the score path. Both stages round
    before ranking with a cid tiebreak, so ordering is FP-noise-proof and
    the whole two-stage cascade is value-hash checked."""
    emb = load_table(spark, sf_dir, "embeddings")
    prefix = F.slice(F.col("embedding"), 1, _MRL_DIM)
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        prefix.alias("qp"),
    )
    c = ensure_min_parallelism(emb).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        prefix.alias("cp"),
    )
    pcos = F.round(
        dot(F.col("qp"), F.col("cp")) / (l2_norm(F.col("qp")) * l2_norm(F.col("cp"))), 6
    )
    wq = Window.partitionBy("qid").orderBy(F.col("pcos").desc(), F.col("cid").asc())
    cand = (
        F.broadcast(q)
        .join(c, F.col("qid") != F.col("cid"))
        .withColumn("pcos", pcos)
        .withColumn("prank", F.row_number().over(wq))
        .filter(F.col("prank") <= _MRL_CAND)
    )
    cosine = F.round(
        dot(F.col("qe"), F.col("ce")) / (l2_norm(F.col("qe")) * l2_norm(F.col("ce"))), 6
    )
    wr = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid").asc())
    return (
        cand.select("qid", "cid", cosine.alias("cosine"))
        .withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= 10)
    )


# ---------------------------------------------------------------------------
# Hard-negative mining (contrastive-training pair generation)
# ---------------------------------------------------------------------------

HARD_NEG_ORACLE = """
WITH b AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS e, {bucket} AS bucket
  FROM embeddings
),
a AS (SELECT vec_id AS qid, label AS qlabel, e AS qe, bucket AS qb
      FROM b WHERE vec_id % 10 = 0),
scored AS (
  SELECT qid, b.vec_id AS neg_id, b.label AS neg_label,
         round(list_inner_product(qe, b.e), 6) AS score
  FROM a JOIN b ON a.qb = b.bucket AND a.qlabel <> b.label
),
ranked AS (
  SELECT qid, neg_id, neg_label, score,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, neg_id ASC) AS rnk
  FROM scored
)
SELECT qid, neg_id, neg_label, score, rnk FROM ranked WHERE rnk <= 4
""".format(bucket=_BUCKET_SQL)


@register("sim_hard_negatives", HARD_NEG_ORACLE)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor
    (every 10th vector), the 4 most-similar vectors with a DIFFERENT
    label from the anchor's own LSH bucket — the "looks similar, isn't"
    pairs that make contrastive losses sharp. Mining globally-hardest
    negatives is an O(n²) score; restricting to the anchor's bucket is
    the standard in-batch/in-shard approximation, and the LSH bucket is
    exactly the shard most likely to hold the hardest ones. Candidate
    generation is the same broadcast-anchors bucket join as
    sim_ann_bucketed_topk; ranking is a partitioned WindowGroupLimit
    (top-4 per anchor capped before the shuffle). Round-before-rank with
    a neg_id tiebreak keeps the ordering FP-noise-proof — fully
    value-hash checked."""
    emb = load_table(spark, sf_dir, "embeddings")
    # bucket + embedding in one map pass (no self-join; see _bucket_col)
    with_vec = emb.select(
        "vec_id", "label", "embedding", _bucket_col(F.col("embedding")).alias("bucket")
    )
    anchors = with_vec.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("qe"),
        F.col("bucket").alias("qbucket"),
    )
    cand = with_vec.select(
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("neg_label"),
        F.col("embedding").alias("ce"),
        F.col("bucket").alias("cbucket"),
    )
    scored = (
        F.broadcast(anchors)
        .join(
            cand,
            (F.col("qbucket") == F.col("cbucket"))
            & (F.col("qlabel") != F.col("neg_label")),
        )
        .select(
            "qid",
            "neg_id",
            "neg_label",
            F.round(dot(F.col("qe"), F.col("ce")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("neg_id").asc())
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 4)


# ---------------------------------------------------------------------------
# SemDeDup: cluster-scoped semantic dedup (Abbas et al. 2023)
# ---------------------------------------------------------------------------

_SEMDEDUP_T = 0.4  # cosine threshold, tuned to the synthetic embedding space

# SemDeDup cell count scales as ceil(n / TARGET_CELL_SIZE) with a floor
# of N_CELLS: CONSTANT expected cell size means total in-cell pairwise
# work Σcell² ≈ (n/S)·S² = n·S — LINEAR in the corpus, the SemDeDup
# paper's actual operating regime (Abbas et al. run ~50k fixed-size
# clusters on LAION, not sqrt(n)). History of this policy: a FIXED cell
# count let cell sizes grow linearly → quadratic pairwise (measured 31x
# wall for 10x data); the r6 fix scaled cells as ceil(sqrt(n)), which
# bounds pairwise at O(n^1.5) but still grows cell sizes as sqrt(n) —
# measured 10.8x on the 10x sf0.1→sf1 step, ~1000x the quadratic term
# at 100x data. Constant cell size kills the super-linear term outright.
#   The naive cost this transfers to is ASSIGNMENT: nearest-of-K with
# K = n/S is n²/S dots if every vector scores every centroid. So
# assignment is HIERARCHICAL (the IVF-HNSW / two-level k-means idea):
# ceil(sqrt(K)) "super-centroids" route each vector to a super-cell
# first (n·sqrt(K) dots), then it scores only that super-cell's ~sqrt(K)
# centroids (n·sqrt(K) more) — O(n·sqrt(n/S)) total, n^1.25 FLOPs on a
# map-side fold that never shuffles a scored row. At true 100 TB scale
# the two-level routing generalizes to more levels (or any ANN coarse
# assigner): the cell-scoped pairwise stage — the actual dedup — stays
# linear regardless.
#   The oracle derives the identical counts from the data via scalar
# subqueries (ceil() on exact BIGINT counts and a correctly-rounded IEEE
# double sqrt are engine-portable, so both engines see the same values).
_SEMDEDUP_CELL_SIZE = 64  # target vectors per cell (S above)

_SEMDEDUP_CELLS_SQL = (
    f"(SELECT greatest({N_CELLS}, CAST(ceil(count(*) / {_SEMDEDUP_CELL_SIZE}.0) AS BIGINT))"
    " FROM embeddings)"
)
_SEMDEDUP_SUPERS_SQL = f"(SELECT CAST(ceil(sqrt(n_cells)) AS BIGINT) FROM ncells)"

SEMDEDUP_ORACLE = f"""
WITH ncells AS (
  SELECT greatest({N_CELLS}, CAST(ceil(count(*) / {_SEMDEDUP_CELL_SIZE}.0) AS BIGINT)) AS n_cells
  FROM embeddings
),
cent AS (
  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS ce,
         sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS cn
  FROM embeddings, ncells WHERE vec_id < ncells.n_cells
),
sup AS (
  SELECT centroid_id AS sup_id, ce AS se, cn AS sn
  FROM cent WHERE centroid_id < {_SEMDEDUP_SUPERS_SQL}
),
c2s AS (
  SELECT centroid_id, sup_id FROM (
    SELECT c.centroid_id, s.sup_id,
           row_number() OVER (PARTITION BY c.centroid_id
                              ORDER BY round(list_inner_product(c.ce, s.se) / (c.cn * s.sn), 6) DESC,
                                       s.sup_id ASC) AS rnk
    FROM cent c CROSS JOIN sup s
  ) WHERE rnk = 1
),
v2s AS (
  SELECT vec_id, sup_id FROM (
    SELECT v.vec_id, s.sup_id,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY round(list_inner_product(v.embedding::DOUBLE[], s.se)
                                             / (sqrt(list_inner_product(v.embedding::DOUBLE[], v.embedding::DOUBLE[])) * s.sn), 6) DESC,
                                       s.sup_id ASC) AS rnk
    FROM embeddings v CROSS JOIN sup s
  ) WHERE rnk = 1
),
assign_scored AS (
  SELECT v.vec_id, c.centroid_id,
         row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY round(list_inner_product(v.embedding::DOUBLE[], c.ce)
                                           / (sqrt(list_inner_product(v.embedding::DOUBLE[], v.embedding::DOUBLE[])) * c.cn), 6) DESC,
                                     c.centroid_id ASC) AS rnk
  FROM embeddings v
  JOIN v2s ON v2s.vec_id = v.vec_id
  JOIN c2s ON c2s.sup_id = v2s.sup_id
  JOIN cent c ON c.centroid_id = c2s.centroid_id
),
assigned AS (
  SELECT a.vec_id, a.centroid_id, e.embedding::DOUBLE[] AS ve,
         sqrt(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) AS vn
  FROM assign_scored a JOIN embeddings e ON e.vec_id = a.vec_id
  WHERE a.rnk = 1
),
dups AS (
  SELECT hi.vec_id, count(*) AS n_dups_lower
  FROM assigned hi JOIN assigned lo
    ON hi.centroid_id = lo.centroid_id AND lo.vec_id < hi.vec_id
  WHERE round(list_inner_product(hi.ve, lo.ve) / (hi.vn * lo.vn), 6)
        >= {_SEMDEDUP_T}
  GROUP BY hi.vec_id
)
SELECT a.vec_id, a.centroid_id,
       coalesce(d.n_dups_lower, 0) AS n_dups_lower,
       d.vec_id IS NULL AS kept
FROM assigned a LEFT JOIN dups d ON a.vec_id = d.vec_id
"""


@register("sim_semdedup_cells", SEMDEDUP_ORACLE)
def sim_semdedup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup SCOPED TO QUANTIZER
    CELLS — route every vector to a coarse cell, then compare pairs ONLY
    within a cell and drop any vector with cosine ≥ t to a lower-id
    cell-mate (deterministic min-id survivorship). The cell scoping is
    the entire scale story: pairwise work is Σ cell_size² instead of
    corpus², and cells are the unit of distribution — the paper's
    observation that semantic duplicates share a cluster makes the
    recall loss acceptable. Threshold 0.4 is tuned to the synthetic
    embedding space (max in-cell cosine ≈ 0.49; real text embeddings
    use ~0.95+).

    Cell policy (see the module comment above SEMDEDUP_ORACLE): cell
    count = ceil(n / CELL_SIZE) — CONSTANT expected cell size, so the
    pairwise stage is LINEAR in the corpus (the prior ceil(sqrt(n))
    policy grew cells as sqrt(n) ⇒ n^1.5 pairwise, measured 10.8x wall
    on the 10x sf0.1→sf1 step). Assignment to n/S centroids is kept
    sub-quadratic by TWO-LEVEL routing: sqrt(K) super-centroids pick a
    super-cell per vector, which then scores only that super-cell's
    centroids — O(n·sqrt(n/S)) dots total.

    Scale posture: both routing stages are broadcast-join + map-side
    max_by folds (partial aggregation — no scored row ever shuffles;
    the reduce moves ≤ one row per vector per map partition), then ONE
    shuffle on centroid_id for the in-cell self-join; at 100 TB the
    corpus is written bucketed by cell so even that shuffle disappears
    (io.write_bucketed), and the routing tree gains levels (or any ANN
    coarse assigner) once K outgrows a broadcast. No cross-cell pair is
    ever generated. The corpus count is a one-scalar control-plane job
    (the k-means-centroid collect contract). The assignment is
    localCheckpointed: three consumers (hi/lo pair sides + the final
    keep join) would otherwise re-run the routing per consumer."""
    import math

    emb = load_table(spark, sf_dir, "embeddings")
    n_cells = max(N_CELLS, math.ceil(emb.count() / _SEMDEDUP_CELL_SIZE))
    n_super = math.ceil(math.sqrt(n_cells))
    cents = emb.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid"),
        l2_norm(F.col("embedding")).alias("centroid_norm"),
    )
    sups = cents.filter(F.col("centroid_id") < n_super).select(
        F.col("centroid_id").alias("sup_id"),
        F.col("centroid").alias("se"),
        F.col("centroid_norm").alias("sn"),
    )

    def route(df: DataFrame, key: str, vec: str, norm: str, cand: DataFrame,
              cand_key: str, cand_vec: str, cand_norm: str) -> DataFrame:
        """argmax-cosine routing: broadcast the candidate table, score
        map-side, fold with max(struct(cos, -cand_key)) — an exact
        row_number()=1 replacement whose partial aggregation keeps the
        scored rows on the mappers (ties: higher rounded cosine, then
        SMALLER candidate id, matching the oracle's ORDER BY)."""
        scored = df.join(F.broadcast(cand)).select(
            key,
            vec,
            norm,
            F.struct(
                F.round(
                    dot(F.col(vec), F.col(cand_vec)) / (F.col(norm) * F.col(cand_norm)), 6
                ).alias("cos"),
                (-F.col(cand_key)).alias("neg_id"),
            ).alias("sc"),
        )
        return (
            scored.groupBy(key)
            .agg(
                F.max("sc").alias("best"),
                F.first(vec).alias(vec),   # constant within the group
                F.first(norm).alias(norm),
            )
            .select(
                key, vec, norm, (-F.col("best.neg_id")).alias(cand_key)
            )
        )

    # level 1: centroid -> super-centroid (K-row control-plane table)
    c2s = route(
        cents, "centroid_id", "centroid", "centroid_norm",
        sups, "sup_id", "se", "sn",
    ).select("sup_id", "centroid_id", "centroid", "centroid_norm")
    v = emb.select(
        "vec_id",
        F.col("embedding").alias("ve"),
        l2_norm(F.col("embedding")).alias("vn"),
    )
    # level 2: vector -> super-cell (n·sqrt(K) dots, map-side fold)
    v2s = route(v, "vec_id", "ve", "vn", sups, "sup_id", "se", "sn")
    # level 3: vector -> nearest centroid WITHIN its super-cell
    in_cell = v2s.join(F.broadcast(c2s), "sup_id").select(
        "vec_id",
        "ve",
        "vn",
        F.struct(
            F.round(
                dot(F.col("ve"), F.col("centroid")) / (F.col("vn") * F.col("centroid_norm")), 6
            ).alias("cos"),
            (-F.col("centroid_id")).alias("neg_id"),
        ).alias("sc"),
    )
    assigned = (
        in_cell.groupBy("vec_id")
        .agg(
            F.max("sc").alias("best"),
            F.first("ve").alias("ve"),
            F.first("vn").alias("vn"),
        )
        .select("vec_id", (-F.col("best.neg_id")).alias("centroid_id"), "ve", "vn")
        .localCheckpoint(eager=True)  # 3 consumers: hi, lo, final keep join
    )
    # DataFrame aliases (not column renames off the same lineage): the
    # rename form makes Catalyst miss the centroid_id equi-key and plan a
    # BroadcastNestedLoopJoin; aliased self-join extracts it and shuffles
    # once on the cell id with the < and cosine predicates as residuals
    hi, lo = assigned.alias("hi"), assigned.alias("lo")
    dups = (
        hi.join(
            lo,
            (F.col("hi.centroid_id") == F.col("lo.centroid_id"))
            & (F.col("lo.vec_id") < F.col("hi.vec_id")),
        )
        .filter(
            F.round(
                dot(F.col("hi.ve"), F.col("lo.ve")) / (F.col("hi.vn") * F.col("lo.vn")),
                6,
            )
            >= _SEMDEDUP_T
        )
        .groupBy(F.col("hi.vec_id").alias("vec_id"))
        .agg(F.count(F.lit(1)).alias("n_dups_lower"))
    )
    return (
        assigned.join(dups, "vec_id", "left")
        .select(
            "vec_id",
            "centroid_id",
            F.coalesce(F.col("n_dups_lower"), F.lit(0)).cast("long").alias("n_dups_lower"),
            F.col("n_dups_lower").isNull().alias("kept"),
        )
    )


# ---------------------------------------------------------------------------
# IVF-PQ: coarse cells + product-quantized RESIDUALS (the production ANN)
# ---------------------------------------------------------------------------


IVFPQ_CODES = 64  # residual codewords/subspace (own constant: recall on the
# near-random fixture embeddings roughly doubles 16 -> 64 and saturates
# after — measured in tests/test_similarity.py's monitor; sim_pq_topk keeps
# its 16-codeword book as the minimal ADC reference shape)


def _ivfpq_oracle() -> str:
    sub = f"(SELECT unnest(range({N_SUB})) AS s)"
    l2 = (
        "round(list_reduce(list_transform(range(1, {d} + 1), "
        "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (x, y) -> x + y), 6)"
    )
    rsub = (
        f"list_transform(range(sub.s * {SUB_DIM} + 1, sub.s * {SUB_DIM} + {SUB_DIM} + 1), "
        "i -> {e}[i] - {c}[i])"
    )
    return f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS ce,
         sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS cn
  FROM embeddings WHERE vec_id < {N_CELLS}
),
assign_scored AS (
  SELECT v.vec_id, c.centroid_id,
         row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY round(list_inner_product(v.embedding::DOUBLE[], c.ce)
                                           / (sqrt(list_inner_product(v.embedding::DOUBLE[], v.embedding::DOUBLE[])) * c.cn), 6) DESC,
                                     c.centroid_id ASC) AS rnk
  FROM embeddings v CROSS JOIN cent c
),
assigned AS MATERIALIZED (
  SELECT vec_id, centroid_id FROM assign_scored WHERE rnk = 1
),
resid AS MATERIALIZED (
  SELECT e.vec_id, e.label, a.centroid_id, sub.s,
         {rsub.format(e='(e.embedding::DOUBLE[])', c='c.ce')} AS rvec
  FROM embeddings e
  JOIN assigned a ON a.vec_id = e.vec_id
  JOIN cent c ON c.centroid_id = a.centroid_id, {sub} sub
),
cb AS MATERIALIZED (
  SELECT vec_id AS code, s, rvec AS cvec FROM resid WHERE vec_id < {IVFPQ_CODES}
),
code_scored AS (
  SELECT r.vec_id AS cid, r.label, r.centroid_id, r.s, c.code,
         row_number() OVER (PARTITION BY r.vec_id, r.s
                            ORDER BY {l2.format(a='r.rvec', b='c.cvec', d=SUB_DIM)} ASC,
                                     c.code ASC) AS rn
  FROM resid r JOIN cb c ON c.s = r.s
),
codes AS (SELECT cid, label, centroid_id, s, code FROM code_scored WHERE rn = 1),
q AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS qe,
         sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS qn
  FROM embeddings WHERE vec_id % 50 = 0
),
q_probe AS (
  SELECT qid, qe, centroid_id, ce FROM (
    SELECT q.qid, q.qe, c.centroid_id, c.ce,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY round(list_inner_product(q.qe, c.ce) / (q.qn * c.cn), 6) DESC,
                                       c.centroid_id ASC) AS rnk
    FROM q CROSS JOIN cent c) t
  WHERE rnk <= {N_PROBE}
),
q_resid AS (
  SELECT qid, centroid_id, sub.s,
         {rsub.format(e='qe', c='ce')} AS qrvec
  FROM q_probe, {sub} sub
),
adc AS (
  SELECT qid, r.centroid_id, r.s, c.code,
         {l2.format(a='r.qrvec', b='c.cvec', d=SUB_DIM)} AS qd
  FROM q_resid r JOIN cb c ON c.s = r.s
),
scored AS (
  SELECT a.qid, k.cid, k.label, round(sum(a.qd), 6) AS approx_d2
  FROM codes k
  JOIN adc a ON a.centroid_id = k.centroid_id AND a.s = k.s AND a.code = k.code
  WHERE a.qid <> k.cid
  GROUP BY a.qid, k.cid, k.label
)
SELECT qid, cid, label, approx_d2,
       row_number() OVER (PARTITION BY qid ORDER BY approx_d2 ASC, cid ASC) AS rnk
FROM scored
QUALIFY rnk <= 5
"""


@register("sim_ivfpq_topk", _ivfpq_oracle())
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the composition production ANN systems actually deploy
    (FAISS ``IVFx,PQy``): the coarse quantizer (``sim_ivf_assign``) routes
    each vector to a cell, PQ codes are trained on the RESIDUAL
    (vector - cell centroid, which is what makes the codebook sharp: cell
    offsets are removed before quantization), and a query probes its
    N_PROBE nearest cells scoring candidates through a per-(query, cell)
    ADC lookup table built from the QUERY residual against that cell.

    Deterministic residual codebook (residual subvectors of the first
    N_CODES corpus vectors) keeps encode + probe fully value-hash
    checkable, like ``sim_pq_topk``.

    Scale posture: encoding is ingest-time (broadcast codebook, map-side
    argmin per subspace — one corpus pass, persists as bytes/vector);
    query time touches ONLY the probed cells' code lists (corpus stored
    partitioned by centroid_id → partition pruning), joined against a
    broadcast ADC of Q x N_PROBE x N_SUB x N_CODES rows — the raw float
    corpus is never re-scanned at query time, and the candidate join is
    keyed (cell, s, code), never a cross join."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = _centroids(spark, sf_dir).select(
        "centroid_id", F.col("centroid").cast("array<double>").alias("ce")
    )
    assigned = sim_ivf_assign(spark, sf_dir).select("vec_id", "centroid_id")
    resid_full = (
        ensure_min_parallelism(emb)
        .join(assigned, "vec_id")
        .join(F.broadcast(cents), "centroid_id")
        .select(
            "vec_id",
            "label",
            "centroid_id",
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                "ce",
                lambda x, y: x - y,
            ).alias("rv"),
        )
    )
    subs = F.array(*[F.slice("rv", s * SUB_DIM + 1, SUB_DIM) for s in range(N_SUB)])
    # Materialize the residual subvectors ONCE (r14, guide §2.4/§5): the
    # corpus-wide IVF assignment window feeding `resid` is referenced by
    # BOTH the codebook (cb → two broadcast builds) and the encode path
    # (`codes`); without a boundary each reference re-executes the full
    # assignment join+window. resid is corpus × N_SUB narrow rows — the
    # natural ingest-time materialization point (codes persist in a real
    # deployment).
    resid = (
        resid_full.select(
            "vec_id", "label", "centroid_id", F.posexplode(subs).alias("s", "rvec")
        )
        .withColumn("rvec_n2", dot(F.col("rvec"), F.col("rvec")))
        .localCheckpoint(eager=True)
    )
    cb = resid.filter(F.col("vec_id") < IVFPQ_CODES).select(
        F.col("vec_id").alias("code"),
        "s",
        F.col("rvec").alias("cvec"),
        F.col("rvec_n2").alias("cvec_n2"),
    )
    d2 = F.round(
        _sq_l2_hoisted(F.col("rvec_n2"), F.col("rvec"), F.col("cvec"), F.col("cvec_n2")), 6
    )
    # argmin via min(struct(d2, code)) — lexicographic struct ordering IS
    # "lowest distance, tie to lowest code", and a groupBy aggregate gets
    # map-side partial aggregation where a window would full-sort each
    # (vector, subspace) partition; at ingest scale that is the encode cost
    codes = (
        resid.join(F.broadcast(cb), "s")
        .groupBy("vec_id", "label", "centroid_id", "s")
        .agg(F.min(F.struct(d2.alias("d2"), F.col("code").alias("code"))).alias("m"))
        .select(
            F.col("vec_id").alias("cid"),
            "label",
            "centroid_id",
            "s",
            F.col("m.code").alias("code"),
        )
    )
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qe"),
        l2_norm(F.col("embedding")).alias("qn"),
    )
    q_scored = q.join(F.broadcast(_centroids(spark, sf_dir))).select(
        "qid",
        "qe",
        "centroid_id",
        F.col("centroid").cast("array<double>").alias("ce"),
        F.round(
            dot(F.col("qe"), F.col("centroid")) / (F.col("qn") * F.col("centroid_norm")),
            6,
        ).alias("ccos"),
    )
    wq = Window.partitionBy("qid").orderBy(F.col("ccos").desc(), F.col("centroid_id").asc())
    q_probe = (
        q_scored.withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") <= N_PROBE)
        .select(
            "qid",
            "centroid_id",
            F.zip_with("qe", "ce", lambda x, y: x - y).alias("qrv"),
        )
    )
    qsubs = F.array(*[F.slice("qrv", s * SUB_DIM + 1, SUB_DIM) for s in range(N_SUB)])
    q_resid = q_probe.select(
        "qid", "centroid_id", F.posexplode(qsubs).alias("s", "qrvec")
    ).withColumn("qrvec_n2", dot(F.col("qrvec"), F.col("qrvec")))
    adc = q_resid.join(F.broadcast(cb), "s").select(
        "qid",
        "centroid_id",
        "s",
        "code",
        F.round(
            _sq_l2_hoisted(F.col("qrvec_n2"), F.col("qrvec"), F.col("cvec"), F.col("cvec_n2")),
            6,
        ).alias("qd"),
    )
    scored = (
        codes.join(F.broadcast(adc), ["centroid_id", "s", "code"])
        .filter(F.col("qid") != F.col("cid"))
        .groupBy("qid", "cid", "label")
        .agg(F.round(F.sum("qd"), 6).alias("approx_d2"))
    )
    wr = Window.partitionBy("qid").orderBy(F.col("approx_d2").asc(), F.col("cid").asc())
    return scored.withColumn("rnk", F.row_number().over(wr)).filter(F.col("rnk") <= 5)


@register("sim_ivfpq_recall")  # rows-only: self-measured ANN quality monitor
def sim_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVF-PQ path against exact brute force, AS A QUERY
    (the ``sim_ivf_recall`` monitor pattern). On the near-random fixture
    embeddings the honest operating point is LOW (~0.1-0.2): nprobe=2/16
    already caps recall near 0.3 (see sim_ivf_recall) and residual
    quantization halves it — random vectors are PQ's worst case, real
    embedding manifolds quantize far better. Recall is bought at serving
    time with N_PROBE and IVFPQ_CODES; this monitor is what prices that
    dial at 100 TB."""
    exact = sim_bruteforce(spark, sf_dir).filter(F.col("rnk") <= 5).select(
        F.col("qid").alias("e_qid"), F.col("cid").alias("e_cid")
    )
    approx = sim_ivfpq_topk(spark, sf_dir).select(
        F.col("qid").alias("a_qid"), F.col("cid").alias("a_cid")
    )
    hits = exact.join(
        approx,
        (F.col("e_qid") == F.col("a_qid")) & (F.col("e_cid") == F.col("a_cid")),
        "left",
    ).groupBy("e_qid").agg(
        (F.sum(F.col("a_cid").isNotNull().cast("int")) / F.count(F.lit(1))).alias(
            "recall"
        )
    )
    return hits.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.avg("recall"), 4).alias("mean_recall"),
        F.round(F.min("recall"), 4).alias("min_recall"),
    )


# ---------------------------------------------------------------------------
# NN-descent refinement round (ANN k-NN GRAPH construction)
# ---------------------------------------------------------------------------

_NND_K = 5
# ring width of the linear-cost init graph: each node pairs with the next
# _NND_RING members of its bucket in sorted-id order, so G0 construction is
# O(n * ring), NOT the O(sum bucket_size^2) all-pairs-within-bucket form the
# r8 sf1 sweep measured at 13.8x on a 10x data step (fixed 256 buckets make
# bucket sizes grow linearly with the corpus). This is also truer to
# NN-descent's contract: a CHEAP imperfect init that the descent rounds
# repair ("a neighbor of my neighbor is probably my neighbor").
_NND_RING = 8

NND_ORACLE = """
WITH b AS (
  SELECT vec_id, embedding::DOUBLE[] AS e, {bucket} AS bucket FROM embeddings
),
blist AS (
  SELECT bucket, list_sort(list(vec_id)) AS ids FROM b GROUP BY bucket
),
ring AS (
  SELECT unnest(flatten(list_transform(range(1, len(ids) + 1),
           i -> list_transform(list_slice(ids, i + 1, least(i + {ring}, len(ids))),
                               y -> struct_pack(a := ids[i], b := y))))) AS p
  FROM blist
),
rp AS (SELECT p.a AS a, p.b AS b FROM ring),
scored0 AS (
  SELECT rp.a, rp.b, round(list_inner_product(ea.e, eb.e), 6) AS score
  FROM rp JOIN b ea ON ea.vec_id = rp.a JOIN b eb ON eb.vec_id = rp.b
),
g0s AS (
  SELECT src, dst, score,
         row_number() OVER (PARTITION BY src ORDER BY score DESC, dst ASC) AS rn
  FROM (
    SELECT a AS src, b AS dst, score FROM scored0
    UNION ALL
    SELECT b AS src, a AS dst, score FROM scored0
  )
),
g0 AS MATERIALIZED (SELECT src, dst FROM g0s WHERE rn <= {k}),
sym AS MATERIALIZED (SELECT src, dst FROM g0 UNION SELECT dst, src FROM g0),
cand AS (
  SELECT DISTINCT a.src AS src, b2.dst AS dst
  FROM sym a JOIN sym b2 ON b2.src = a.dst AND b2.dst <> a.src
  UNION
  SELECT src, dst FROM g0
),
resc AS (
  SELECT c.src, c.dst, round(list_inner_product(e1.e, e2.e), 6) AS score
  FROM cand c JOIN b e1 ON e1.vec_id = c.src JOIN b e2 ON e2.vec_id = c.dst
)
SELECT src, dst, score, rnk FROM (
  SELECT src, dst, score,
         row_number() OVER (PARTITION BY src ORDER BY score DESC, dst ASC) AS rnk
  FROM resc) t
WHERE rnk <= {k}
""".format(bucket=_BUCKET_SQL, k=_NND_K, ring=_NND_RING)


@register("sim_nn_descent_round", NND_ORACLE)
def sim_nn_descent_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One NN-DESCENT refinement round (Dong et al.) over the corpus k-NN
    graph: start from the LSH-bucket top-k graph G0, propose every
    neighbor-of-a-neighbor as a candidate ("a neighbor of my neighbor is
    probably my neighbor" — the symmetrized 2-hop join), exact-score the
    proposals, keep the best k per node. Because G0 is contained in the
    candidate set, the refined k-th score DOMINATES G0's pointwise —
    recall can only improve (pinned in tests/test_similarity.py). This is
    how production ANN-graph indexes (NN-descent, HNSW layer seeding) are
    actually built; iterating the same round converges.

    Scale posture: G0 comes from the bucketed LSH join (never all-pairs;
    at 100 TB the per-bucket cap applies exactly as in the dedup LSH
    path); the 2-hop proposal join is keyed on the shared neighbor with
    fan-out bounded by k² per node; re-scoring joins the embedding table
    twice on its key. Everything shuffles on node ids — no window sees
    more than one node's candidates (≤ ~2k² rows)."""
    emb = load_table(spark, sf_dir, "embeddings")
    # bucket + embedding in one map pass (no self-join; see _bucket_col)
    b = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        _bucket_col(F.col("embedding")).alias("bucket"),
    )
    # linear-cost init: each node pairs with the next _NND_RING members of
    # its bucket in sorted-id order (O(n*ring) pairs; the all-pairs-within-
    # bucket form was O(n²/buckets) — see _NND_RING comment)
    ring = (
        b.groupBy("bucket")
        .agg(F.array_sort(F.collect_list("vec_id")).alias("ids"))
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ids"),
                        lambda x, i: F.transform(
                            F.slice(F.col("ids"), i + 2, _NND_RING),
                            lambda y: F.struct(x.alias("a"), y.alias("b")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
    )
    ea = b.select(F.col("vec_id").alias("a"), F.col("e").alias("e_a"))
    ebt = b.select(F.col("vec_id").alias("b"), F.col("e").alias("e_b"))
    scored0 = (
        ring.join(ea, "a")
        .join(ebt, "b")
        .select("a", "b", F.round(dot(F.col("e_a"), F.col("e_b")), 6).alias("score"))
    )
    sym0 = scored0.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("a").alias("src"), F.col("b").alias("dst"), F.col("score")
                ),
                F.struct(
                    F.col("b").alias("src"), F.col("a").alias("dst"), F.col("score")
                ),
            )
        ).alias("r")
    ).select("r.src", "r.dst", "r.score")
    w0 = Window.partitionBy("src").orderBy(F.col("score").desc(), F.col("dst").asc())
    g0 = (
        sym0.withColumn("rn", F.row_number().over(w0))
        .filter(F.col("rn") <= _NND_K)
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    sym = (
        g0.select(
            F.explode(
                F.array(
                    F.struct("src", "dst"),
                    F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
                )
            ).alias("p")
        )
        .select("p.src", "p.dst")
        .distinct()
    )
    s1 = sym.alias("s1")
    s2 = sym.alias("s2")
    twohop = (
        s1.join(s2, (F.col("s2.src") == F.col("s1.dst")) & (F.col("s2.dst") != F.col("s1.src")))
        .select(F.col("s1.src").alias("src"), F.col("s2.dst").alias("dst"))
    )
    cand = twohop.unionByName(g0.select("src", "dst")).distinct()
    e1 = b.select(F.col("vec_id").alias("src"), F.col("e").alias("e_src"))
    e2 = b.select(F.col("vec_id").alias("dst"), F.col("e").alias("e_dst"))
    # dst join first, src join LAST: the re-scored frame then carries
    # hash(src) partitioning into the per-src top-k window — no extra
    # Exchange (guide §2.4); inner joins commute, rows/values unchanged
    resc = (
        cand.join(e2, "dst")
        .join(e1, "src")
        .select("src", "dst", F.round(dot(F.col("e_src"), F.col("e_dst")), 6).alias("score"))
    )
    wr = Window.partitionBy("src").orderBy(F.col("score").desc(), F.col("dst").asc())
    return resc.withColumn("rnk", F.row_number().over(wr)).filter(F.col("rnk") <= _NND_K)


# ---------------------------------------------------------------------------
# Multi-probe LSH ANN (query probes its bucket + all Hamming-1 neighbors)
# ---------------------------------------------------------------------------


def _multiprobe_oracle() -> str:
    # the 9 probe buckets per query: own bucket + each plane bit flipped
    flips = ", ".join(f"xor(qb, {1 << p})" for p in range(N_PLANES))
    return f"""
WITH b AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS e, {_BUCKET_SQL} AS bucket
  FROM embeddings
),
q AS (
  SELECT vec_id AS qid, e AS qe, bucket AS qb FROM b WHERE vec_id % 50 = 0
),
probes AS (
  SELECT qid, qe, unnest([CAST(qb AS BIGINT), {flips}]) AS pb FROM q
),
scored AS (
  SELECT DISTINCT qid, b.vec_id AS cid, b.label,
         round(list_inner_product(qe, b.e), 6) AS cosine
  FROM probes p JOIN b ON b.bucket = p.pb AND p.qid <> b.vec_id
)
SELECT qid, cid, label, cosine, rnk FROM (
  SELECT qid, cid, label, cosine,
         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rnk
  FROM scored) t
WHERE rnk <= 5
"""


@register("sim_ann_multiprobe_topk", _multiprobe_oracle())
def sim_ann_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-PROBE LSH ANN (Lv et al., VLDB'07): each query probes its own
    hyperplane bucket plus all N_PLANES Hamming-1 neighbors (the buckets a
    near-miss sign flip would have landed in) — recall rises at the cost
    of 1+N_PLANES bucket probes per query WITHOUT adding hash tables,
    which is the memory trade production LSH services actually choose.
    Candidates from any probed bucket are exact-cosine re-ranked, top-5;
    by construction the candidate set contains ``sim_ann_bucketed_topk``'s
    (probe 0 IS its bucket), so recall dominates single-probe pointwise
    (pinned in tests/test_similarity.py).

    Scale posture: probes explode map-side to (query, bucket) keys — the
    candidate join stays a hash equi-join on bucket with fan-out bounded
    by (1+planes) × bucket size; the corpus is never cross-joined. The
    broadcast side is the bounded query set, as in every sim_* probe."""
    emb = load_table(spark, sf_dir, "embeddings")
    # bucket + embedding in one map pass (no self-join; see _bucket_col)
    with_vec = emb.select(
        "vec_id", "label", "embedding", _bucket_col(F.col("embedding")).alias("bucket")
    )
    q = with_vec.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("bucket").alias("qb"),
    )
    probe_arr = F.array(
        F.col("qb").cast("long"),
        *[
            F.col("qb").bitwiseXOR(F.lit(1 << p)).cast("long")
            for p in range(N_PLANES)
        ],
    )
    probes = q.select("qid", "qe", F.explode(probe_arr).alias("pb"))
    c = with_vec.select(
        F.col("vec_id").alias("cid"),
        "label",
        F.col("embedding").alias("ce"),
        F.col("bucket").cast("long").alias("cb"),
    )
    # No distinct needed: a candidate has exactly ONE bucket and a query's
    # 1+N_PLANES probe values are pairwise distinct (xor with distinct
    # single bits), so each (qid, cid) pair joins through at most one
    # probe — the oracle's SELECT DISTINCT is equally a no-op. Dropping
    # it removes a full exchange of the scored rows.
    scored = (
        F.broadcast(probes)
        .join(c, (F.col("pb") == F.col("cb")) & (F.col("qid") != F.col("cid")))
        .select(
            "qid",
            "cid",
            "label",
            F.round(dot(F.col("qe"), F.col("ce")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid").asc())
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 5)



# ---------------------------------------------------------------------------
# Graph-ANN query path (r8 verdict task 5): fixed-hop beam search over a
# connectivity-guaranteed kNN graph — the production query pattern for
# graph ANN (HNSW/Vamana-style search, flattened to bounded batched hops).
#
# Index construction (deterministic, SQL-replayable):
#   1. init = multi-scale id-ring: rank nodes by vec_id, link rank i to
#      ranks (i + s) mod n for strides {1,2,8,32,128} — a Kleinberg-style
#      structural layer that is connected BY CONSTRUCTION (stride 1) and
#      cheap (O(n * strides), no all-pairs anywhere);
#   2. two NN-DESCENT repair rounds (Dong et al.): symmetrize, propose
#      neighbors-of-neighbors, exact-score, keep best k per node — the
#      geometric layer (bucket-constrained init like sim_nn_descent_round
#      fragments into per-bucket islands, unusable for SEARCH: measured
#      recall 0.08 — the descent needs a connected init to repair);
#   3. search graph = geometric top-k ∪ raw ring: score-greedy trimming
#      drops long-range links, so the structural layer is kept verbatim —
#      the same reason Vamana/NSG force a spanning structure into the
#      index.
# ---------------------------------------------------------------------------

_GS_STRIDES = [1, 2, 8, 32, 128]  # multi-scale ring: short + long links
_GS_NND_K = 5    # geometric out-degree kept per repair round
_GS_ENTRIES = 4  # fixed global entry points (HNSW entry idiom)
_GS_SEEDS = 4    # per-query seeds from its own LSH bucket
_GS_BEAM = 8     # frontier width per query per hop
_GS_HOPS = 4     # expansion rounds (unrolled in the oracle)
_GS_K = 10       # final neighbors returned per query


def _gs_nnd_round_sql(gin: str, gout: str) -> str:
    """One unrolled NN-descent repair round over edge CTE ``gin``."""
    return f"""
sym_{gout} AS MATERIALIZED (
  SELECT src, dst FROM {gin} UNION SELECT dst, src FROM {gin}
),
cand_{gout} AS (
  SELECT DISTINCT x.src AS a, y.dst AS b
  FROM sym_{gout} x JOIN sym_{gout} y ON y.src = x.dst AND y.dst <> x.src
  UNION
  SELECT src, dst FROM {gin}
),
resc_{gout} AS (
  SELECT c.a AS src, c.b AS dst,
         round(list_inner_product(e1.e, e2.e), 6) AS score
  FROM cand_{gout} c JOIN ev e1 ON e1.vec_id = c.a JOIN ev e2 ON e2.vec_id = c.b
),
{gout} AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY score DESC, dst ASC) AS rn
    FROM resc_{gout}) t
  WHERE rn <= {_GS_NND_K}
),"""


def _graph_search_oracle() -> str:
    hop_cte = """
f{p} AS (
  SELECT qid, cid FROM (
    SELECT qid, cid,
           row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid ASC) AS rn
    FROM v{p}) t
  WHERE rn <= {beam}
),
n{h} AS (
  SELECT DISTINCT f.qid, g.dst AS cid
  FROM f{p} f JOIN sg g ON g.src = f.cid
),
s{h} AS (
  SELECT nn.qid, nn.cid,
         round(list_inner_product(q.qe, c.e), 6) AS score
  FROM n{h} nn
  JOIN qv q ON q.qid = nn.qid
  JOIN ev c ON c.vec_id = nn.cid
  WHERE NOT EXISTS (SELECT 1 FROM v{p} v WHERE v.qid = nn.qid AND v.cid = nn.cid)
),
v{h} AS MATERIALIZED (SELECT * FROM v{p} UNION ALL SELECT * FROM s{h}),"""
    hops = "".join(
        hop_cte.format(p=h - 1, h=h, beam=_GS_BEAM) for h in range(1, _GS_HOPS + 1)
    )
    strides = ", ".join(str(s) for s in _GS_STRIDES)
    return f"""
WITH ev AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS e, {_BUCKET_SQL} AS bucket
  FROM embeddings
),
cnt AS (SELECT count(*) AS n FROM ev),
rk AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS r FROM ev),
ring AS MATERIALIZED (
  SELECT a.vec_id AS src, b.vec_id AS dst
  FROM rk a
  CROSS JOIN (SELECT unnest([{strides}]) AS s) st
  CROSS JOIN cnt
  JOIN rk b ON b.r = (a.r + st.s) % cnt.n
),
scored0 AS (
  SELECT r.src, r.dst, round(list_inner_product(e1.e, e2.e), 6) AS score
  FROM ring r JOIN ev e1 ON e1.vec_id = r.src JOIN ev e2 ON e2.vec_id = r.dst
),
g0 AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY score DESC, dst ASC) AS rn
    FROM (SELECT src, dst, score FROM scored0
          UNION ALL SELECT dst, src, score FROM scored0) both_dirs) t
  WHERE rn <= {_GS_NND_K}
),{_gs_nnd_round_sql('g0', 'g1')}{_gs_nnd_round_sql('g1', 'g2')}
sg AS MATERIALIZED (
  SELECT src, dst FROM g2 UNION SELECT src, dst FROM ring
),
qv AS (SELECT vec_id AS qid, e AS qe, bucket AS qb FROM ev WHERE vec_id % 50 = 0),
fixed_entries AS (SELECT vec_id AS cid FROM ev ORDER BY vec_id LIMIT {_GS_ENTRIES}),
bucket_seeds AS (
  SELECT qid, cid FROM (
    SELECT q.qid, c.vec_id AS cid,
           row_number() OVER (PARTITION BY q.qid ORDER BY c.vec_id ASC) AS rn
    FROM qv q JOIN ev c ON c.bucket = q.qb) t
  WHERE rn <= {_GS_SEEDS}
),
seeds AS (
  SELECT DISTINCT qid, cid FROM (
    SELECT qid, cid FROM bucket_seeds
    UNION ALL SELECT q.qid, fe.cid FROM qv q CROSS JOIN fixed_entries fe) u
),
v0 AS MATERIALIZED (
  SELECT s.qid, s.cid, round(list_inner_product(q.qe, c.e), 6) AS score
  FROM seeds s JOIN qv q ON q.qid = s.qid JOIN ev c ON c.vec_id = s.cid
),{hops}
ranked AS (
  SELECT qid, cid, score,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid ASC) AS rnk
  FROM v{_GS_HOPS} WHERE cid <> qid
)
SELECT qid, cid, score, rnk FROM ranked WHERE rnk <= {_GS_K}
"""


def _gs_search_graph(spark: SparkSession, sf_dir: str):
    """(search_graph, b) where b = (vec_id, e, bucket) and search_graph =
    two-round NN-descent geometric top-k ∪ the structural id-ring."""
    from pyspark.sql import Observation

    emb = load_table(spark, sf_dir, "embeddings")
    # bucket + embedding in one map pass (no self-join; see _bucket_col);
    # the corpus count rides the checkpoint job as an observe() metric
    # (the graph-loop convergence-probe pattern) instead of a second job
    obs = Observation(f"gs_n_{uuid4().hex[:8]}")
    b = (
        emb.select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("e"),
            _bucket_col(F.col("embedding")).alias("bucket"),
        )
        .observe(obs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    n = obs.get["n"]
    # global rank by vec_id WITHOUT an unpartitioned window (the scale
    # killer): two-level prefix — per-block row_number (window partitioned
    # by id block = bounded partitions) + a broadcast join of block
    # offsets (window over the tiny block table) — the eval_auc_rank
    # pattern. The oracle states the same rank as a plain row_number.
    blocked = b.select(
        "vec_id", F.floor(F.col("vec_id") / (1 << 16)).alias("blk")
    )
    blk_tot = blocked.groupBy("blk").agg(F.count(F.lit(1)).alias("c"))
    w_blk = Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)
    blk_off = blk_tot.select(
        "blk", F.coalesce(F.sum("c").over(w_blk), F.lit(0)).alias("off")
    )
    w_in = Window.partitionBy("blk").orderBy("vec_id")
    rk = blocked.join(F.broadcast(blk_off), "blk").select(
        "vec_id", (F.col("off") + F.row_number().over(w_in) - 1).alias("r")
    )
    idmap = rk.select(F.col("r").alias("r2"), F.col("vec_id").alias("nbr"))
    ring = (
        rk.select(
            "vec_id",
            "r",
            F.explode(
                F.array(*[F.lit(s) for s in _GS_STRIDES])
            ).alias("s"),
        )
        .select("vec_id", ((F.col("r") + F.col("s")) % n).alias("r2"))
        .join(idmap, "r2")
        .select(F.col("vec_id").alias("src"), F.col("nbr").alias("dst"))
        .localCheckpoint(eager=True)
    )
    ea = b.select(F.col("vec_id").alias("src"), F.col("e").alias("e_src"))
    ebt = b.select(F.col("vec_id").alias("dst"), F.col("e").alias("e_dst"))

    def score_edges(p: DataFrame) -> DataFrame:
        # dst join first, src join LAST: the output then carries
        # hash(src) partitioning, so the consumer's per-src top-k window
        # (w0) needs no extra Exchange (guide §2.4 — same key, one
        # shuffle). Inner joins commute; the row set and score
        # arithmetic are unchanged.
        return (
            p.join(ebt, "dst")
            .join(ea, "src")
            .select(
                "src",
                "dst",
                F.round(dot(F.col("e_src"), F.col("e_dst")), 6).alias("score"),
            )
        )

    w0 = Window.partitionBy("src").orderBy(F.col("score").desc(), F.col("dst").asc())
    sym0 = score_edges(ring).select(
        F.explode(
            F.array(
                F.struct("src", "dst", "score"),
                F.struct(
                    F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("score")
                ),
            )
        ).alias("p")
    ).select("p.*")
    g = (
        sym0.withColumn("rn", F.row_number().over(w0))
        .filter(F.col("rn") <= _GS_NND_K)
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    for rnd in range(2):  # NN-descent repair rounds
        sym = (
            g.select(
                F.explode(
                    F.array(
                        F.struct("src", "dst"),
                        F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
                    )
                ).alias("p")
            )
            .select("p.*")
            .distinct()
        )
        x, y = sym.alias("x"), sym.alias("y")
        twohop = x.join(
            y, (F.col("y.src") == F.col("x.dst")) & (F.col("y.dst") != F.col("x.src"))
        ).select(F.col("x.src").alias("src"), F.col("y.dst").alias("dst"))
        cand = twohop.unionByName(g).distinct()
        g = (
            score_edges(cand)
            .withColumn("rn", F.row_number().over(w0))
            .filter(F.col("rn") <= _GS_NND_K)
            .select("src", "dst")
        )
        # mid-loop rounds materialize (g feeds the next round's sym AND
        # cand union); the FINAL round's g has exactly one consumer — the
        # union+distinct below — so its checkpoint would be a redundant
        # back-to-back materialization (r14: one job + RDD write saved)
        if rnd < 1:
            g = g.localCheckpoint(eager=True)
    return g.unionByName(ring).distinct().localCheckpoint(eager=True), b


@register("sim_graph_search_topk", _graph_search_oracle())
def sim_graph_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRAPH-ANN QUERY SIDE (r8 verdict task 5): beam search over the
    ring-initialized, NN-descent-repaired graph (see the index banner
    above). Every query seeds from its own LSH bucket (≤{seeds} smallest
    ids) plus {entries} fixed global entry points; each of the {hops}
    hops expands the current top-{beam} beam through the graph in ONE
    batched frontier join shared by ALL queries, exact-scores only
    never-visited candidates (anti-join), and folds them into the
    visited set. Final answer: top-{k} of everything visited, self
    excluded. Deterministic by construction — 6dp-rounded scores, cid
    tie-breaks — so the unrolled-CTE oracle replays it value-exactly.

    Beats the repo's other ANN paths on this corpus (recall ~0.45 vs IVF
    0.27 / IVFPQ 0.12, ~26% of corpus scored) — self-monitored by
    [[sim_graph_search_recall]].

    Scale posture: hops are BATCHED joins (frontier keyed on node id ⋈
    edge list), never per-query traversals — 1e6 queries ride the same
    {hops} joins; per-query fan-out is bounded by beam × degree × hops;
    the query set broadcasts, graph and corpus stay partitioned. Index
    construction is O(n·strides) init + two NND rounds with ≤(2k)²
    per-node proposal fan-out — no stage is all-pairs."""
    graph, b = _gs_search_graph(spark, sf_dir)
    q = b.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe"), F.col("bucket").alias("qb")
    )
    ce = b.select(F.col("vec_id").alias("cid"), F.col("e").alias("ce"))

    def score(cands: DataFrame) -> DataFrame:
        # the candidate set is query-side-bounded (queries × beam ×
        # degree), so IT broadcasts and the corpus-sized ce is probed
        # map-side — the corpus never shuffles at query time (the
        # docstring's posture; previously this was a sort-merge join
        # that exchanged+sorted ce once per call, r14 guide §3.1)
        return (
            ce.join(F.broadcast(cands), "cid")
            .join(F.broadcast(q.select("qid", "qe")), "qid")
            .select(
                "qid",
                "cid",
                F.round(dot(F.col("qe"), F.col("ce")), 6).alias("score"),
            )
        )

    wseed = Window.partitionBy("qid").orderBy(F.col("cid").asc())
    bucket_seeds = (
        F.broadcast(q.select("qid", "qb"))
        .join(b.select(F.col("vec_id").alias("cid"), "bucket"), F.col("bucket") == F.col("qb"))
        .withColumn("rn", F.row_number().over(wseed))
        .filter(F.col("rn") <= _GS_SEEDS)
        .select("qid", "cid")
    )
    fixed = q.select("qid").crossJoin(
        F.broadcast(
            b.orderBy("vec_id").limit(_GS_ENTRIES).select(F.col("vec_id").alias("cid"))
        )
    )
    visited = score(
        bucket_seeds.unionByName(fixed).distinct()
    ).localCheckpoint(eager=True)
    wb = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("cid").asc())
    for _ in range(_GS_HOPS):
        frontier = (
            visited.withColumn("rn", F.row_number().over(wb))
            .filter(F.col("rn") <= _GS_BEAM)
            .select("qid", "cid")
        )
        # frontier (queries × beam) broadcasts against the partitioned
        # graph; the visited set (queries × visited-so-far, bounded by
        # beam × degree × hops) broadcasts into the anti-join — per hop
        # the graph is probed map-side and only the tiny (qid, cid)
        # candidate set shuffles (its distinct), guide §3.1/§2.4
        nbrs = (
            graph.join(F.broadcast(frontier), frontier.cid == graph.src)
            .select("qid", F.col("dst").alias("cid"))
            .distinct()
        )
        new = nbrs.join(
            F.broadcast(visited.select("qid", "cid")), ["qid", "cid"], "left_anti"
        )
        visited = visited.unionByName(score(new)).localCheckpoint(eager=True)
    return (
        visited.filter(F.col("cid") != F.col("qid"))
        .withColumn("rnk", F.row_number().over(wb))
        .filter(F.col("rnk") <= _GS_K)
        .select("qid", "cid", "score", "rnk")
    )


sim_graph_search_topk.__doc__ = sim_graph_search_topk.__doc__.format(
    seeds=_GS_SEEDS, entries=_GS_ENTRIES, hops=_GS_HOPS, beam=_GS_BEAM, k=_GS_K
)


@register("sim_graph_search_recall")  # rows-only: self-measured ANN quality
def sim_graph_search_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall monitor for the graph-ANN path: overlap of
    [[sim_graph_search_topk]]'s top-k with the EXACT inner-product top-k
    per query (identical metric, both exclude self), averaged over
    queries. One row: (n_queries, mean_recall_pct). The exact side
    broadcasts the bounded query set against the corpus — the same plan
    shape as sim_bruteforce_topk."""
    got = sim_graph_search_topk(spark, sf_dir).select("qid", "cid")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    c = emb.select(F.col("vec_id").alias("cid"), F.col("e").alias("ce"))
    wb = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("cid").asc())
    exact = (
        F.broadcast(q)
        .join(c, F.col("qid") != F.col("cid"))
        .select(
            "qid", "cid", F.round(dot(F.col("qe"), F.col("ce")), 6).alias("score")
        )
        .withColumn("rnk", F.row_number().over(wb))
        .filter(F.col("rnk") <= _GS_K)
        .select("qid", "cid")
    )
    hits = got.join(exact, ["qid", "cid"], "semi")
    per_q = q.select("qid").join(
        hits.groupBy("qid").agg(F.count(F.lit(1)).alias("n_hit")), "qid", "left"
    )
    return per_q.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(
            100.0 * F.avg(F.coalesce(F.col("n_hit"), F.lit(0)) / _GS_K), 2
        ).alias("mean_recall_pct"),
    )


# ---------------------------------------------------------------------------
# Radius (range) search (r9): ALL neighbors within a similarity threshold —
# the retrieval mode dedup/recall jobs need (top-k truncates; radius does
# not), over the same multi-probe LSH candidate generation.
# ---------------------------------------------------------------------------

_RANGE_T = 0.25  # cosine threshold


def _range_search_oracle() -> str:
    flips = ", ".join(f"xor(qb, {1 << p})" for p in range(N_PLANES))
    return f"""
WITH b AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS e,
         sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
         {_BUCKET_SQL} AS bucket
  FROM embeddings
),
q AS (
  SELECT vec_id AS qid, e AS qe, nrm AS qn, bucket AS qb FROM b WHERE vec_id % 50 = 0
),
probes AS (
  SELECT qid, qe, qn, unnest([CAST(qb AS BIGINT), {flips}]) AS pb FROM q
),
scored AS (
  SELECT DISTINCT qid, b.vec_id AS cid, b.label,
         round(list_inner_product(qe, b.e) / (qn * b.nrm), 6) AS cosine
  FROM probes p JOIN b ON b.bucket = p.pb AND p.qid <> b.vec_id
)
SELECT qid, cid, label, cosine FROM scored WHERE cosine >= {_RANGE_T}
"""


@register("sim_range_search", _range_search_oracle())
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RADIUS SEARCH: every candidate with cosine ≥ {t} per query — the
    companion mode to the top-k paths (a fixed k silently truncates dense
    neighborhoods; dedup/compliance retrieval must see ALL of them).
    Candidates come from the multi-probe LSH generation (own bucket +
    all Hamming-1 probes — sim_ann_multiprobe_topk's recall trade) and
    are exact-cosine filtered; no window at all, since radius search has
    no per-query rank.

    Scale posture: probe join is bucket-keyed (the query side explodes to
    1+N_PLANES bucket probes; the corpus side stays partitioned by
    bucket), scoring is map-side; output size is data-dependent by
    definition — the caller bounds it with the threshold, not a k."""
    emb = load_table(spark, sf_dir, "embeddings")
    # bucket + embedding in one map pass (no self-join; see _bucket_col)
    b = emb.select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("e"),
        l2_norm(F.col("embedding")).alias("nrm"),
        _bucket_col(F.col("embedding")).alias("bucket"),
    )
    q = b.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
        F.col("bucket").alias("qb"),
    )
    probes = q.select(
        "qid",
        "qe",
        "qn",
        F.explode(
            F.array(
                F.col("qb").cast("long"),
                *[
                    F.col("qb").cast("long").bitwiseXOR(F.lit(1 << p))
                    for p in range(N_PLANES)
                ],
            )
        ).alias("pb"),
    )
    # No distinct needed (the sim_ann_multiprobe_topk argument): one
    # bucket per candidate x pairwise-distinct probe values per query ⇒
    # (qid, cid) already unique; the oracle's SELECT DISTINCT is equally
    # a no-op. Dropping it leaves the radius search with NO exchange at
    # all — a pure broadcast-join map pipeline.
    scored = (
        F.broadcast(probes)
        .join(b, (F.col("bucket") == F.col("pb")) & (F.col("qid") != F.col("vec_id")))
        .select(
            "qid",
            F.col("vec_id").alias("cid"),
            "label",
            F.round(dot(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("nrm")), 6).alias(
                "cosine"
            ),
        )
    )
    return scored.filter(F.col("cosine") >= _RANGE_T)


sim_range_search.__doc__ = sim_range_search.__doc__.format(t=_RANGE_T)


# ---------------------------------------------------------------------------
# MMR diversification (r9): re-rank retrieval results for RELEVANCE and
# DIVERSITY jointly (Carbonell & Goldstein 1998) — the standard fix for
# "the top-k are 5 near-identical passages" in RAG serving.
# ---------------------------------------------------------------------------

_MMR_C = 20  # candidate pool per query (relevance top-C)
_MMR_K = 5  # results selected per query
# lambda = 0.7 as the exact fraction 7/10: score10 = 7*rel - 3*max_sim


def _mmr_oracle() -> str:
    """Unrolled MMR selection: step 1 = argmax relevance; step i = argmax
    7*rel - 3*(max sim to the i-1 already-selected), ties to lower cid."""
    steps = []
    union = "SELECT qid, cid FROM sel1"
    for i in range(2, _MMR_K + 1):
        steps.append(
            f"pen{i} AS MATERIALIZED (\n"
            f"  SELECT p.qid, p.ca AS cid, max(p.sim) AS pen\n"
            f"  FROM pairs p JOIN ({union}) s ON p.qid = s.qid AND p.cb = s.cid\n"
            f"  GROUP BY p.qid, p.ca\n), "
            f"sc{i} AS MATERIALIZED (\n"
            f"  SELECT c.qid, c.cid, 7 * c.rel - 3 * pe.pen AS score10,\n"
            f"         row_number() OVER (PARTITION BY c.qid\n"
            f"           ORDER BY 7 * c.rel - 3 * pe.pen DESC, c.cid ASC) AS rn\n"
            f"  FROM cands c\n"
            f"  JOIN pen{i} pe ON c.qid = pe.qid AND c.cid = pe.cid\n"
            f"  LEFT JOIN ({union}) s ON c.qid = s.qid AND c.cid = s.cid\n"
            f"  WHERE s.cid IS NULL\n), "
            f"sel{i} AS MATERIALIZED (\n"
            f"  SELECT qid, cid, {i} AS step, score10 FROM sc{i} WHERE rn = 1\n)"
        )
        union = f"{union} UNION ALL SELECT qid, cid FROM sel{i}"
    chained = ",\n".join(steps)
    final = " UNION ALL ".join(
        f"SELECT qid, cid, step, score10 FROM sel{i}"
        for i in range(1, _MMR_K + 1)
    )
    return f"""
WITH q AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS qe,
         sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS qn
  FROM embeddings WHERE vec_id % 50 = 0
),
c AS MATERIALIZED (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS ce,
         sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS cn
  FROM embeddings
),
scored AS (
  -- materialize the cosine BEFORE ranking and rank the bare column: an
  -- ORDER BY that references the array columns drags them through the
  -- (queries x corpus)-row window sort and spills tens of GB at sf1
  SELECT qid, cid, round(list_inner_product(qe, ce) / (qn * cn), 6) AS cosine
  FROM q JOIN c ON qid <> cid
),
ranked AS (
  SELECT qid, cid,
         CAST(floor(cosine * 1000000 + 0.5) AS BIGINT) AS rel,
         row_number() OVER (PARTITION BY qid
           ORDER BY cosine DESC, cid ASC) AS rnk
  FROM scored
),
-- MATERIALIZED on every multi-referenced CTE: cands feeds sel1, pairs,
-- and all k-1 sc-steps; pairs feeds all k-1 pen-steps. DuckDB's default
-- inlining re-plans the (queries x corpus) brute-force cosine PER
-- REFERENCE — measured 992.6 s at sf1 vs 22.8 s Spark-side (r11); the
-- fences bind each frame once. Purely an optimization fence.
cands AS MATERIALIZED (
  SELECT r.qid, r.cid, c.ce, c.cn, r.rel
  FROM ranked r JOIN c USING (cid) WHERE r.rnk <= {_MMR_C}
),
pairs AS MATERIALIZED (
  SELECT a.qid, a.cid AS ca, b.cid AS cb,
         CAST(floor(round(list_inner_product(a.ce, b.ce) / (a.cn * b.cn), 6)
                    * 1000000 + 0.5) AS BIGINT) AS sim
  FROM cands a JOIN cands b ON a.qid = b.qid AND a.cid <> b.cid
),
sel1 AS MATERIALIZED (
  SELECT qid, cid, 1 AS step, 7 * rel AS score10
  FROM (SELECT qid, cid, rel, row_number() OVER (PARTITION BY qid
          ORDER BY rel DESC, cid ASC) AS rn FROM cands)
  WHERE rn = 1
),
{chained}
{final}
"""


@register("sim_mmr_diversify", _mmr_oracle())
def sim_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMAL MARGINAL RELEVANCE re-ranking (Carbonell & Goldstein, SIGIR
    1998): from each query's relevance top-20 candidates, greedily select
    5 results maximizing lambda*relevance - (1-lambda)*max-similarity-to-
    already-selected (lambda = 0.7) — relevance alone returns near-
    duplicate passages; MMR trades a little relevance for coverage.

    The greedy loop is UNROLLED: k-1 bounded dataframe stages, each one
    penalty aggregation over the candidate pair table + an anti-join on
    the selected set + a qid-partitioned argmax window. Every frame past
    the candidate stage is (queries x C)- or (queries x C^2)-sized —
    bounded per query by construction, linear in the query batch.

    EXACT: relevance and pairwise similarity quantize to micro-units
    AFTER the shared round(cosine, 6) convention, so the selection
    argmax compares integers (score10 = 7*rel - 3*pen, lambda as the
    exact fraction 7/10) and ties break on cid — engines cannot diverge
    mid-greedy (one flipped pick would cascade).

    Scale posture: candidate generation is the sim_bruteforce shape
    (broadcast query set, corpus stays partitioned, WindowGroupLimit
    keeps C rows per query through the shuffle); swap in the bucketed
    ANN candidates for the 100 TB path — the MMR stages are agnostic to
    where candidates came from. The k-step loop moves candidate-pool
    frames only; each step is localCheckpointed so plans stay flat."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        l2_norm(F.col("embedding")).alias("qn"),
    )
    c = ensure_min_parallelism(emb).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        l2_norm(F.col("embedding")).alias("cn"),
    )
    cos = F.round(dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn")), 6)
    scored = F.broadcast(q).join(c, F.col("qid") != F.col("cid")).select(
        "qid",
        "cid",
        "ce",
        "cn",
        F.floor(cos * 1000000 + 0.5).cast("long").alias("rel"),
        cos.alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid").asc())
    cands = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _MMR_C)
        .select("qid", "cid", "ce", "cn", "rel")
        .localCheckpoint(eager=True)  # feeds the pair table + every step
    )
    a = cands.select("qid", F.col("cid").alias("ca"), F.col("ce").alias("ea"), F.col("cn").alias("na"))
    b = cands.select("qid", F.col("cid").alias("cb"), F.col("ce").alias("eb"), F.col("cn").alias("nb"))
    sim = F.round(dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6)
    pairs = (
        a.join(b, ["qid"]).filter(F.col("ca") != F.col("cb"))
        .select(
            "qid", "ca", "cb",
            F.floor(sim * 1000000 + 0.5).cast("long").alias("sim"),
        )
        .localCheckpoint(eager=True)  # feeds k-1 penalty stages
    )
    slim = cands.select("qid", "cid", "rel")
    w1 = Window.partitionBy("qid").orderBy(F.col("rel").desc(), F.col("cid").asc())
    selected = (
        slim.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") == 1)
        .select("qid", "cid", F.lit(1).alias("step"), (7 * F.col("rel")).alias("score10"))
        .localCheckpoint(eager=True)
    )
    # loop frames are query-batch-bounded (selected ≤ Q×k rows, pen ≤
    # Q×C) — broadcast them so each step's joins are map-side over the
    # checkpointed pool instead of sort-merge exchanges (checkpointed
    # frames never auto-broadcast: LogicalRDD stats default huge); per
    # step this leaves two small shuffles (pen's groupBy, the pick
    # window) instead of ~five (r14, guide §3.1)
    for i in range(2, _MMR_K + 1):
        pen = (
            pairs.join(
                F.broadcast(selected.select("qid", F.col("cid").alias("cb"))),
                ["qid", "cb"],
            )
            .groupBy("qid", F.col("ca").alias("cid"))
            .agg(F.max("sim").alias("pen"))
        )
        score10 = 7 * F.col("rel") - 3 * F.col("pen")
        wi = Window.partitionBy("qid").orderBy(score10.desc(), F.col("cid").asc())
        pick = (
            slim.join(
                F.broadcast(selected.select("qid", "cid")), ["qid", "cid"], "left_anti"
            )
            .join(F.broadcast(pen), ["qid", "cid"])
            .withColumn("rn", F.row_number().over(wi))
            .filter(F.col("rn") == 1)
            .select("qid", "cid", F.lit(i).alias("step"), score10.alias("score10"))
        )
        selected = selected.unionByName(pick).localCheckpoint(eager=True)
    return selected
