"""Changelog / run-log aggregation (SURVEY.md §2.4 A1-A5).

The reference keeps six module-global dicts keyed by FeedID with
last-write-wins assignment (``updateChangeLog``,
/root/reference/publish_to_catalog.py:93-124) and folds them into one
run-summary row (``getLogsForLogDataset`` L553-565, ``updateLogDataset``
L567-581). Here the changelog is data: a ``run_log`` DataFrame
``(feed_id, action, message, ts)`` aggregated declaratively.

- A1 valid/invalid/total counts per feed (L328-342, L356-359) — hash
  aggregate with automatic partial+final (map-side combine).
- A2 last-write-wins per (feed_id, action) (dict assignment, L95-124) —
  row_number window dedupe.
- A3 per-action distinct-feed counts (L554-563).
- A4 error-line fold (``stringifyErrorLines`` L547-551) — sorted
  collect_list + concat (sorted: the reference's dict order is insertion
  order; a distributed engine must pick a deterministic order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quarantine_counts(df: DataFrame, group_key: str, valid_col: str = "is_valid") -> DataFrame:
    """A1: per-group valid/invalid/total with the L357-359 identity
    valid + invalid = total."""
    return df.groupBy(group_key).agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.sum(F.when(F.col(valid_col), 1).otherwise(0)).alias("valid_rows"),
        F.sum(F.when(~F.col(valid_col), 1).otherwise(0)).alias("invalid_rows"),
    )


def bus_numbers(df: DataFrame, feed_col: str, route_col: str, count_alias: str = "n") -> DataFrame:
    """A1b (publish_to_catalog.py:356-365): the reference attaches a per-feed
    ``busLineDict`` — a dict of line-category → count — to each changelog
    entry. Distributed twin: per-(feed, route) counts rolled into one
    ``MAP<route, count>`` row per feed.

    Two-level hash aggregate, both with map-side partial combine; the map is
    built from an ``array_sort``-ed entry list so the same data always
    yields the same map iteration order (dict insertion order is
    deterministic in the serial reference; a distributed engine must impose
    an order explicitly). Map cardinality is bounded by distinct routes per
    feed — a per-key metadata dict, not a data-sized blob — so the row
    stays small at 100 TB.

    Keys are cast to string and NULL routes coalesce to ``'unknown'``:
    ``map_from_entries`` throws at runtime on a null key, whereas the
    reference's dict (and a SQL GROUP BY) would carry a NULL-keyed group —
    the sentinel keeps the operator total on generic inputs. Oracles must
    apply the same coalesce."""
    safe_route = F.coalesce(F.col(route_col).cast("string"), F.lit("unknown")).alias(route_col)
    per_route = df.groupBy(F.col(feed_col), safe_route).agg(F.count(F.lit(1)).alias(count_alias))
    return per_route.groupBy(feed_col).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct(F.col(route_col), F.col(count_alias))))
        ).alias("bus_numbers")
    )


def last_write_wins(
    log: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """A2: keep the latest entry per key (publish_to_catalog.py:95-124)."""
    order = [F.col(order_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        log.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def action_counts(log: DataFrame, action_col: str = "action", id_col: str = "feed_id") -> DataFrame:
    """A3 (publish_to_catalog.py:554-563): dict-size per action category."""
    return log.groupBy(action_col).agg(
        F.countDistinct(id_col).alias("n_feeds"),
        F.count(F.lit(1)).alias("n_entries"),
    )


def fold_errors(
    log: DataFrame, id_col: str = "feed_id", msg_col: str = "message", sep: str = "\n\n"
) -> DataFrame:
    """A4 (publish_to_catalog.py:547-551): one concatenated error blob.
    Deterministic: lines sorted before joining."""
    line = F.concat_ws(": ", F.col(id_col), F.col(msg_col))
    return log.agg(
        F.array_join(F.array_sort(F.collect_list(line)), sep).alias("error_blob")
    )


def scd2_history(
    log: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension Type 2: every change event becomes a
    versioned validity interval — ``valid_from`` = its own timestamp,
    ``valid_to`` = the next change's timestamp for the same key (NULL while
    current). The warehouse-history generalization of A2: last_write_wins
    is exactly ``scd2_history(...).filter(is_current)``.

    One shuffle on the key (the same window spec computes lead + version),
    deterministic under ties via the tiebreak column — the 100 TB posture
    matches every other W1-family window here."""
    order = [F.col(order_col).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    nxt = F.lead(F.col(order_col)).over(w)
    return (
        log.withColumn("valid_from", F.col(order_col))
        .withColumn("valid_to", nxt)
        .withColumn("version", F.row_number().over(w))
        .withColumn("is_current", nxt.isNull())
    )
