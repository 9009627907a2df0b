"""JSONL ingestion with errors-as-data routing.

The JSON twin of the CSV reader's tolerance contract (csv_ingest.py) and
the HTTP source's errors-as-data rows (socrata.py, SURVEY.md §2.1 S4): bad
records are never dropped silently and never kill the job — they land in a
quarantine frame with the raw line preserved, mirroring the reference's
log-and-continue behavior (publish_to_catalog.py's per-feed try/except).

Scale posture: PERMISSIVE mode parses each line exactly once; the corrupt
column is populated by the same pass (no re-read). The valid/quarantine
split is two filters over one scan — Spark collapses them into a single
stage each; at 100 TB the quarantine side is written to its own path so
reprocessing touches only the bad lines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Read line-delimited JSON with the given schema; return
    (valid_rows, quarantine_rows). Quarantine rows carry the raw line."""
    full_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    raw = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    # Spark rejects queries whose referenced columns are ONLY the corrupt
    # column (QUERY_ONLY_CORRUPT_RECORD_COLUMN); the quarantine frame keeps
    # the partially-parsed real columns alongside the raw line, which both
    # satisfies that contract and aids triage.
    valid = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = raw.filter(F.col(CORRUPT_COL).isNotNull()).withColumnRenamed(
        CORRUPT_COL, "raw_line"
    )
    return valid, quarantine
