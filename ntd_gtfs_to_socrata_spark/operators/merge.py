"""Key-based merge layer (SURVEY.md §2.3 J1-J5).

The reference does these joins as hand-written Python nested loops /
membership tests; here each is a declarative join Catalyst can plan
(broadcast for small dims, sort-merge + AQE skew handling otherwise):

- J1  feed-ID resolution   — left outer equi-join on a regex-extracted key
      (``getFourfourFromCatalogonMatchingFeedID``,
      /root/reference/publish_to_catalog.py:503-513).
- J2  create-vs-update routing — null-key ⇒ 'create' else 'update'
      (publish_to_catalog.py:536-543): the anti/semi halves of J1.
- J3  deletion anti-join   — sink rows absent from incoming ⇒ delete set
      (``locateDeletions``, publish_to_catalog.py:261-288).
- J4  upsert (merge-by-key) — incoming wins over existing
      (publish_to_catalog.py:345-352): plain-Spark MERGE via union +
      row_number window dedupe.
- J5  full sync = J4 + J3  — snapshot replace by key
      (publish_to_catalog.py:354): MERGE ... WHEN NOT MATCHED BY SOURCE
      THEN DELETE semantics.

Scale notes: the upsert shuffles once on the key (window partitionBy);
both inputs arrive key-partitioned so AQE coalesces. Deletion anti-join
on the same key reuses the shuffle exchange when planned together. For a
lakehouse target this whole module maps to a single Delta/Iceberg MERGE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resolve_by_key(
    incoming: DataFrame,
    catalog: DataFrame,
    key: str,
    broadcast_catalog: bool = True,
) -> DataFrame:
    """J1: left outer equi-join; catalog is a small dimension ⇒ broadcast
    hash join (no shuffle of the big side)."""
    right = F.broadcast(catalog) if broadcast_catalog else catalog
    return incoming.join(right, on=key, how="left")


def route_create_update(
    resolved: DataFrame, resolved_id_col: str, action_col: str = "action"
) -> DataFrame:
    """J2 (publish_to_catalog.py:536-543)."""
    return resolved.withColumn(
        action_col,
        F.when(F.col(resolved_id_col).isNull(), F.lit("create")).otherwise(
            F.lit("update")
        ),
    )


def locate_deletions(existing: DataFrame, incoming: DataFrame, key: str) -> DataFrame:
    """J3 (publish_to_catalog.py:261-288): existing \\ incoming by key."""
    return existing.join(incoming, on=key, how="left_anti")


def upsert(
    existing: DataFrame,
    incoming: DataFrame,
    key: str | list[str],
    order_tiebreak: Column | None = None,
) -> DataFrame:
    """J4: plain-Spark MERGE-by-key; incoming rows win over existing.

    union + per-key row_number with a source-priority ordering — one
    shuffle on the key. Columns are aligned by name (schema-tolerant:
    missing columns become nulls).
    """
    keys = [key] if isinstance(key, str) else list(key)
    src = incoming.withColumn("__src_priority", F.lit(0))
    tgt = existing.withColumn("__src_priority", F.lit(1))
    unioned = src.unionByName(tgt, allowMissingColumns=True)
    order = [F.col("__src_priority").asc()]
    if order_tiebreak is not None:
        order.append(order_tiebreak)
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src_priority")
    )


def full_sync(existing: DataFrame, incoming: DataFrame, key: str | list[str]) -> DataFrame:
    """J5: upsert + delete-absent ⇒ the post-sync snapshot equals
    ``incoming`` deduped by key (incoming wins); rows only in ``existing``
    are dropped. Expressed as upsert-then-semi-join so the idempotency
    property (sync twice = fixpoint) is explicit in the plan."""
    keys = [key] if isinstance(key, str) else list(key)
    merged = upsert(existing, incoming, keys)
    return merged.join(incoming.select(*keys).distinct(), on=keys, how="left_semi")


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, value: str
) -> DataFrame:
    """Classify every key across two snapshots as insert / delete /
    update / unchanged — the CDC extract generalizing locate_deletions +
    upsert into ONE full-outer join (reference analog:
    publish_to_catalog.py:486-528's separate delete-scan and upsert
    passes). Returns (key, change) rows.

    Scale posture: one co-partitioned sort-merge join; bucket both
    snapshots on the key (io.write_bucketed) and the exchange disappears.
    """
    o = old.select(F.col(key).alias("__k_old"), F.col(value).alias("__v_old"))
    n = new.select(F.col(key).alias("__k_new"), F.col(value).alias("__v_new"))
    change = (
        F.when(F.col("__k_old").isNull(), "insert")
        .when(F.col("__k_new").isNull(), "delete")
        .when(F.col("__v_old") != F.col("__v_new"), "update")
        .otherwise("unchanged")
    )
    return o.join(n, o.__k_old == n.__k_new, "full_outer").select(
        F.coalesce(F.col("__k_old"), F.col("__k_new")).alias(key),
        change.alias("change"),
    )


def snapshot_delta(
    old: DataFrame,
    new: DataFrame,
    key: str,
    value: str,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """The value-carrying CDC delta stream behind [[snapshot_diff]]:
    ``(key, change, v_old, v_new, *carry)`` — v_old/v_new are NULL outside
    their side, carry columns are coalesced across sides. This is the input
    an incremental materialized-view maintainer consumes: each row carries
    exactly enough to retract the old contribution and apply the new one.

    Same plan as snapshot_diff: ONE co-partitioned full-outer sort-merge
    join on the key (exchange-free when both snapshots are bucketed)."""
    o = old.select(
        F.col(key).alias("__k_old"),
        F.col(value).alias("v_old"),
        *[F.col(c).alias(f"__o_{c}") for c in carry],
    )
    n = new.select(
        F.col(key).alias("__k_new"),
        F.col(value).alias("v_new"),
        *[F.col(c).alias(f"__n_{c}") for c in carry],
    )
    change = (
        F.when(F.col("__k_old").isNull(), "insert")
        .when(F.col("__k_new").isNull(), "delete")
        .when(F.col("v_old") != F.col("v_new"), "update")
        .otherwise("unchanged")
    )
    return o.join(n, o.__k_old == n.__k_new, "full_outer").select(
        F.coalesce(F.col("__k_old"), F.col("__k_new")).alias(key),
        change.alias("change"),
        "v_old",
        "v_new",
        *[
            F.coalesce(F.col(f"__o_{c}"), F.col(f"__n_{c}")).alias(c)
            for c in carry
        ],
    )
