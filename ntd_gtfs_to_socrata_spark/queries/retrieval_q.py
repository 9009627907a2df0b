"""Lexical retrieval (▲ north-star; the reference has no search surface —
its only text handling is regex validation at publish_to_catalog.py:128-154).

Training-data pipelines use lexical retrieval constantly: BM25 is the
standard first-stage retriever for RAG corpora, the workhorse for
decontamination sweeps ("find training docs that answer eval questions"),
and the cheap pre-filter before embedding rerank. The engine-native
formulation is three map-side-combinable aggregations (term frequency,
document frequency, document length) plus one broadcast join per scalar —
never a per-query scan.

Scale posture at 100 TB:
- tf/df/dl are ONE pass over the exploded token table (df and dl both
  derive from the tf aggregate, so the corpus is tokenized exactly once);
- corpus scalars (N, avgdl) are a 1-row scalar aggregate broadcast back
  via crossJoin — the ``tp_mixture_weights`` shape, never a global window;
- the query-term set is constant-size, so the score join is a BROADCAST
  semi-join against tf: per-query cost is proportional to the posting
  lists touched, not the corpus;
- top-k per query is a window partitioned BY QUERY TERM — bounded
  partitions (≤ docs containing the term), ranked on the ROUNDED score so
  FP noise cannot flip the cut (the ``dedup_incremental_lsh`` argmax
  pattern).

Determinism contract: the probe queries are derived from the corpus itself
(document-frequency ranks 11-15, tie-broken by token) via an anti-join of
two TakeOrderedAndProject frames — no global window anywhere — so the
whole pipeline, query selection included, is value-hash checked against
DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.io import ensure_min_parallelism, load_table
from ntd_gtfs_to_socrata_spark.operators import textops as TX
from ntd_gtfs_to_socrata_spark.queries import register

_K1 = 1.2  # BM25 term-frequency saturation
_B = 0.75  # BM25 length normalization
_TOPK = 10  # results per query term
_TERM_LO = 10  # query terms = df ranks (10, 15] — mid-frequency probes
_TERM_HI = 15

BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents
),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token
),
dfr AS (
  SELECT token, count(*) AS df FROM tf GROUP BY token
),
dl AS (
  SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id
),
scalars AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
),
top_hi AS (
  SELECT token, df FROM dfr ORDER BY df DESC, token ASC LIMIT {_TERM_HI}
),
top_lo AS (
  SELECT token FROM dfr ORDER BY df DESC, token ASC LIMIT {_TERM_LO}
),
terms AS (
  SELECT h.token, h.df FROM top_hi h ANTI JOIN top_lo l ON h.token = l.token
),
scored AS (
  SELECT tf.doc_id, tf.token,
         round(
           ln(1 + (CAST(s.n_docs AS DOUBLE) - t.df + 0.5) / (t.df + 0.5))
           * (tf.tf * ({_K1} + 1))
           / (tf.tf + {_K1} * (1 - {_B} + {_B} * dl.dl / s.avgdl)),
           6) AS bm25
  FROM tf
  JOIN terms t USING (token)
  JOIN dl USING (doc_id)
  CROSS JOIN scalars s
),
ranked AS (
  SELECT token, doc_id, bm25,
         row_number() OVER (PARTITION BY token ORDER BY bm25 DESC, doc_id ASC)
           AS rnk
  FROM scored
)
SELECT token, doc_id, bm25, rnk FROM ranked WHERE rnk <= {_TOPK}
"""


@register("rag_bm25_topk", BM25_ORACLE)
def rag_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25(k1=1.2, b=0.75) top-10 documents for each of five corpus-derived
    probe terms (document-frequency ranks 11-15).

    N and avgdl are defined over documents that produce at least one token
    (both derive from the tf aggregate, so Spark and oracle agree by
    construction). Scores are ranked AFTER rounding to 6 decimals with a
    doc_id tie-break so the top-k cut is FP-noise-proof."""
    from ntd_gtfs_to_socrata_spark.operators.stagecache import stage_boundary

    docs = ensure_min_parallelism(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("token"))
    # Stage boundary: tf feeds dfr, dl AND the score join. Measured in r7
    # (tools/measure_exchanges.py): WITHOUT this persist the tf aggregate
    # executed 3x (per-consumer column pruning defeats AQE exchange
    # reuse — 10 executed / 3 reused shuffle stages); WITH it the
    # tokenize+tf subtree materializes once and the final plan carries 5
    # executed stages, all distinct. This makes the docstring's "tokenized
    # exactly once" claim structural, not hoped-for.
    tf = stage_boundary(
        toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf")),
        "rag_bm25_tf",
    )
    # dfr feeds top_hi, top_lo AND the score join; dl feeds the score join
    # AND the corpus scalars — same measured-non-reuse story as tf (their
    # keyed aggregates executed twice each without the boundary), and both
    # are the natural BM25 index artifacts (vocab-sized / doc-sized).
    dfr = stage_boundary(
        tf.groupBy("token").agg(F.count(F.lit(1)).alias("df")), "rag_bm25_dfr"
    )
    dl = stage_boundary(
        tf.groupBy("doc_id").agg(F.sum("tf").alias("dl")), "rag_bm25_dl"
    )
    scalars = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # df ranks (_TERM_LO, _TERM_HI]: anti-join of two TakeOrderedAndProject
    # frames — constant-size, no global window even during query selection
    top_hi = dfr.orderBy(F.col("df").desc(), F.col("token").asc()).limit(_TERM_HI)
    top_lo = (
        dfr.orderBy(F.col("df").desc(), F.col("token").asc())
        .limit(_TERM_LO)
        .select("token")
    )
    terms = top_hi.join(top_lo, "token", "left_anti")
    scored = (
        tf.join(F.broadcast(terms), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(scalars))
        .select(
            "token",
            "doc_id",
            F.round(
                F.log(
                    F.lit(1)
                    + (F.col("n_docs").cast("double") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (_K1 + 1))
                / (F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))),
                6,
            ).alias("bm25"),
        )
    )
    w = Window.partitionBy("token").orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOPK)
        .select("token", "doc_id", "bm25", "rnk")
    )
