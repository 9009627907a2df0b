"""Multimodal-column queries (north-star extension) over ``documents``
reinterpreted as a media table — binary payloads + typed metadata, with the
decode step as an Arrow-batched mapInPandas stub (see
operators/multimodal.py for the stub contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.io import load_table
from ntd_gtfs_to_socrata_spark.operators import multimodal as MM
from ntd_gtfs_to_socrata_spark.queries import register

MM_META_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       source AS uri,
       CASE WHEN octet_length(encode(text)) > 300 THEN 'large' ELSE 'small' END AS size_class
FROM documents
"""


@register("mm_binary_metadata", MM_META_ORACLE)
def mm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary column + metadata projection: byte length computed on the
    binary payload itself (JVM-side), no decode needed — the metadata-only
    scan path that must not touch blob contents at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    payload = MM.attach_payload(docs)
    return payload.select(
        "doc_id",
        F.length(F.col("payload")).cast("long").alias("n_bytes"),
        F.col("media_meta.uri").alias("uri"),
        F.when(F.length(F.col("payload")) > 300, "large").otherwise("small").alias(
            "size_class"
        ),
    )


MM_DECODE_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       CASE WHEN octet_length(encode(text)) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
       octet_length(encode(text)) % 640 + 1 AS width,
       (octet_length(encode(text)) // 640) % 480 + 1 AS height,
       TRUE AS ok
FROM documents
"""


@register("mm_decode_stub", MM_DECODE_ORACLE)
def mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode (STUB codec, real plumbing). The
    oracle replicates the deterministic fake's formula — so the contract
    checked here is the UDF batch path: schema, binary transfer, partition
    iteration."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.decode_media(MM.attach_payload(docs))


MM_FRAMES_ORACLE = """
WITH decoded AS (
  SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents
)
SELECT doc_id,
       CAST(unnest(range(0, least(n_bytes // 100 + 1, 4))) AS BIGINT) AS frame_no,
       n_bytes
FROM decoded
"""


@register("mm_frame_sample", MM_FRAMES_ORACLE)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling shape: one row per sampled frame (explode over a
    per-blob frame index), the video-preprocessing fan-out pattern. Frame
    count derived from payload size (stub); explode stays JVM-side."""
    docs = load_table(spark, sf_dir, "documents")
    payload = MM.attach_payload(docs)
    n_frames = F.least(
        (F.length("payload").cast("long") / 100).cast("long") + 1, F.lit(4)
    )
    return payload.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0).cast("long"), n_frames - 1)).alias("frame_no"),
        F.length("payload").cast("long").alias("n_bytes"),
    )


MM_AUDIO_ORACLE = """
WITH b AS (
  SELECT doc_id,
         list_transform(range(1, length(text) + 1), i -> ord(substr(text, i, 1))) AS samples
  FROM documents
),
w AS (
  SELECT doc_id,
         list_transform(range(0, CAST(ceil(len(samples) / 100.0) AS BIGINT)),
                        g -> samples[g * 100 + 1 : g * 100 + 100]) AS wins
  FROM b
)
SELECT doc_id,
       CAST(generate_subscripts(wins, 1) - 1 AS INT) AS window_no,
       CAST(len(unnest(wins)) AS BIGINT) AS n_samples,
       CAST(list_aggregate(list_transform(unnest(wins), x -> x * x), 'sum') AS BIGINT) AS sum_sq,
       CAST(list_aggregate(unnest(wins), 'max') AS BIGINT) AS peak
FROM w
"""


@register("mm_audio_window_stats", MM_AUDIO_ORACLE)
def mm_audio_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction shape: payload bytes as 8-bit PCM (STUB
    codec — the fixture corpus is ASCII, so byte values ARE code points
    and the oracle replays the exact windows), then numpy-vectorized
    per-100-sample window sum-of-squares + peak inside Arrow-batched
    mapInPandas. Integer outputs ⇒ bit-exact value-hash check of the
    whole UDF path (batch iteration, fan-out row expansion, schema).

    Scale posture: pure map-side fan-out (no shuffle); each task decodes
    and windows only its partition's blobs. At 100 TB this is the VAD /
    loudness-filter front of an audio training pipeline; swapping the
    stub for soundfile/ffmpeg changes one function
    (operators/multimodal.py::audio_window_batch)."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.audio_window_stats(MM.attach_payload(docs))
