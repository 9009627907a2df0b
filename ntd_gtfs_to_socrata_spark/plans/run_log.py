"""The run-log publish (SURVEY.md §3 entry point 3) — ``updateLogDataset``
(/root/reference/publish_to_catalog.py:553-581): fold the changelog into
one summary row and append it to a log sink."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.operators import changelog as CL


def run_summary(log: DataFrame, run_successful: bool) -> DataFrame:
    """A3 + A4 + the run header (L567-581) as one single-row frame."""
    counts = CL.action_counts(log)
    wide = counts.groupBy().pivot("action").sum("n_feeds")
    errors = CL.fold_errors(
        log.filter(F.col("action") == "error"), id_col="feed_id", msg_col="message"
    )
    return (
        wide.crossJoin(errors)
        .withColumn("run_successful", F.lit(run_successful))
        .withColumn("run_ts", F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
    )
