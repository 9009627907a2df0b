"""PySpark-native analytics engine with the query/data-processing
capabilities of turnofftheapp/ntd-gtfs-to-socrata.

Reference (read-only): /root/reference/publish_to_catalog.py — a single-file
batch ETL that syncs GTFS transit data to Socrata. This package re-expresses
its capabilities (distributed CSV/zip ingestion, schema-tolerant projection,
validation split, key-based merge, metadata join, run-log aggregation,
pluggable sinks) Spark-first, plus the large-scale training-data-pipeline
surface (dedup, similarity search, multimodal columns, text analysis).

Layout:
    session    — SparkSession factory tuned for local[N] + cluster posture
    io         — fixture-table loaders
    functions  — scalar Column helpers (SURVEY.md §2.6)
    operators  — validation / keys / merge / changelog / dedup / similarity /
                 text / window composites (SURVEY.md §2.2-2.5)
    sources    — CSV/zip/JSON ingest adapters (SURVEY.md §2.1 S1-S6)
    sinks      — Sink protocol + local & HTTP-batch adapters (S7-S11)
    plans      — end-to-end pipelines mirroring the reference's 3 run modes
    streaming  — Structured Streaming variants of the event-window ops
    queries    — the registry consumed by __spark_entry__ (driver contract)
"""

__version__ = "0.1.0"
