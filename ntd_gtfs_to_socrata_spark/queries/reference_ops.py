"""Reference-semantics queries (SURVEY.md §2.2-2.4) over the fixture tables.

Each query exercises one (or a tight cluster) of the reference's operators —
projection, validation split, key derivation, metadata join, merge,
changelog aggregation — re-expressed as declarative DataFrame plans, with a
DuckDB oracle that derives the *same* inputs from the same parquet so the
value-hash comparison is exact.

Dirty inputs (non-numeric coords, sci-notation, nan/inf, bad URLs, missing
join markers) are synthesized deterministically from fixture columns —
integer-derived strings only, so Spark and DuckDB render identical text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.io import load_table
from ntd_gtfs_to_socrata_spark.operators import bloom as B
from ntd_gtfs_to_socrata_spark.operators import changelog as CL
from ntd_gtfs_to_socrata_spark.operators import keys as K
from ntd_gtfs_to_socrata_spark.operators import merge as M
from ntd_gtfs_to_socrata_spark.operators import validation as V
from ntd_gtfs_to_socrata_spark.queries import register

# ---------------------------------------------------------------------------
# Flagship: validate → split → per-group counts (P7/P10/A1 shape over a join)
# ---------------------------------------------------------------------------

FLAGSHIP_ORACLE = """
SELECT
  o_orderpriority,
  (l_quantity BETWEEN 1 AND 45) AND (l_discount BETWEEN 0.01 AND 0.07) AS is_valid,
  count(*) AS n_rows,
  count(DISTINCT l_orderkey) AS n_orders,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority, is_valid
"""


@register("flagship_validate_split_agg", FLAGSHIP_ORACLE)
def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core analytics shape (validate rows, split, count per
    group — publish_to_catalog.py:328-342) over lineitem ⋈ orders.

    Plan shape at scale: lineitem scans with only 5 columns read; the join
    shuffles on orderkey (or broadcasts orders if small); aggregation is
    partial+final hash agg.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    is_valid = F.col("l_quantity").between(1, 45) & F.col("l_discount").between(0.01, 0.07)
    # pre-aggregate per (orderkey, validity) BEFORE the join: the join and
    # the distinct count then run over ~|orders| rows instead of |lineitem|
    # rows, and countDistinct's expand disappears (each key is already
    # unique per group) — 4x less shuffle volume, 2x faster at sf0.1, and
    # the ratio grows with lines-per-order at 100 TB.
    per_order = (
        li.withColumn("is_valid", is_valid)
        .groupBy("l_orderkey", "is_valid")
        .agg(
            F.count(F.lit(1)).alias("nr"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
    )
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority", "is_valid")
        .agg(
            F.sum("nr").alias("n_rows"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("rev"), 2).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# P1 thumbprint projection
# ---------------------------------------------------------------------------

P1_ORACLE = """
SELECT c_custkey AS feed_key, c_name AS name
FROM customer WHERE c_mktsegment = 'BUILDING'
"""


@register("p1_thumbprint_projection", P1_ORACLE)
def p1_thumbprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 (publish_to_catalog.py:55-66): 2-field thumbprint projection with
    a pushed-down filter. Columns + predicate reach the parquet scan."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("feed_key"), F.col("c_name").alias("name"))
    )


# ---------------------------------------------------------------------------
# P2 schema-tolerant projection
# ---------------------------------------------------------------------------

P2_ORACLE = """
SELECT p_partkey AS stop_id, p_name AS stop_name, p_size AS location_type,
       CAST(NULL AS VARCHAR) AS stop_code, CAST(NULL AS VARCHAR) AS zone_id
FROM part
"""


@register("p2_schema_tolerant_projection", P2_ORACLE)
def p2_schema_tolerant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 (publish_to_catalog.py:207-245): project a source onto a canonical
    target layout; columns absent from the source become nulls instead of
    the reference's variable-width row drop (SURVEY.md §7 hard-parts)."""
    target = [
        ("stop_id", "p_partkey"),
        ("stop_name", "p_name"),
        ("location_type", "p_size"),
        ("stop_code", None),
        ("zone_id", None),
    ]
    df = load_table(spark, sf_dir, "part")
    cols = [
        (F.col(src).alias(name) if src is not None else F.lit(None).cast("string").alias(name))
        for name, src in target
    ]
    return df.select(*cols)


# ---------------------------------------------------------------------------
# P3/P4 derived key + WKT point
# ---------------------------------------------------------------------------

P3P4_ORACLE = """
SELECT
  CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR) AS feed_id_stop_id,
  'POINT(' || CAST(l_partkey % 360 - 180 AS VARCHAR) || ' ' || CAST(l_suppkey % 180 - 90 AS VARCHAR) || ')' AS wkt
FROM lineitem
"""


@register("p3_p4_derived_keys", P3P4_ORACLE)
def p3_p4_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 surrogate key (publish_to_catalog.py:237) + P4 WKT point (L236),
    integer-derived coordinates for engine-identical text rendering."""
    li = load_table(spark, sf_dir, "lineitem")
    lon = (F.col("l_partkey") % 360 - 180).cast("long").cast("string")
    lat = (F.col("l_suppkey") % 180 - 90).cast("long").cast("string")
    return li.select(
        K.surrogate_key(
            F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
        ).alias("feed_id_stop_id"),
        K.wkt_point(lon, lat).alias("wkt"),
    )


# ---------------------------------------------------------------------------
# P5 tag-membership filter (array_contains)
# ---------------------------------------------------------------------------

P5_ORACLE = """
SELECT lang, count(*) AS n_docs
FROM documents
WHERE list_contains(string_split(text, ' '), 'spark')
GROUP BY lang
"""


@register("p5_tag_membership_filter", P5_ORACLE)
def p5_tag_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 (publish_to_catalog.py:305): null-safe array membership filter;
    here on a tokenized text column."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.array_contains(F.split(F.col("text"), " "), "spark"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# P7/P8/P10/A1: stringly-typed validation + quarantine split + counts
# ---------------------------------------------------------------------------

_DIRTY_INPUT_SQL = """
  SELECT
    l_returnflag,
    CASE l_linenumber % 6
      WHEN 0 THEN CAST(l_orderkey % 200 - 100 AS VARCHAR)
      WHEN 1 THEN '  ' || CAST(l_orderkey % 200 - 100 AS VARCHAR) || ' '
      WHEN 2 THEN CAST(l_orderkey % 9 AS VARCHAR) || 'e1'
      WHEN 3 THEN 'nan'
      WHEN 4 THEN 'inf'
      ELSE 'x' || CAST(l_orderkey % 200 AS VARCHAR)
    END AS stop_lat,
    CAST(l_partkey % 400 - 200 AS VARCHAR) AS stop_lon,
    CASE l_suppkey % 3 WHEN 0 THEN '' WHEN 1 THEN '1' ELSE 'station' END AS location_type
  FROM lineitem
"""

A1_ORACLE = f"""
WITH stops AS ({_DIRTY_INPUT_SQL}),
flagged AS (
  SELECT l_returnflag,
    coalesce(TRY_CAST(stop_lat AS DOUBLE) BETWEEN -90 AND 90, FALSE)
      AND coalesce(TRY_CAST(stop_lon AS DOUBLE) BETWEEN -180 AND 180, FALSE)
      AND (trim(location_type) = '' OR TRY_CAST(location_type AS DOUBLE) IS NOT NULL)
      AS is_valid
  FROM stops
)
SELECT l_returnflag, count(*) AS total_rows,
       CAST(sum(CASE WHEN is_valid THEN 1 ELSE 0 END) AS BIGINT) AS valid_rows,
       CAST(sum(CASE WHEN NOT is_valid THEN 1 ELSE 0 END) AS BIGINT) AS invalid_rows
FROM flagged GROUP BY l_returnflag
"""


def _dirty_stops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the dirty stops_raw fixture (FIXTURES.md §B1) from
    lineitem: plain/padded/sci-notation/nan/inf/non-numeric coordinate
    strings + empty/numeric/non-numeric location types."""
    from ntd_gtfs_to_socrata_spark.io import ensure_min_parallelism

    # rebalance the 5 source columns before the string synthesis + cast
    # probes so the map stage is parallel (single-row-group fixture file)
    li = ensure_min_parallelism(
        load_table(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
        )
    )
    lat_base = (F.col("l_orderkey") % 200 - 100).cast("long").cast("string")
    variant = F.col("l_linenumber") % 6
    stop_lat = (
        F.when(variant == 0, lat_base)
        .when(variant == 1, F.concat(F.lit("  "), lat_base, F.lit(" ")))
        .when(variant == 2, F.concat((F.col("l_orderkey") % 9).cast("long").cast("string"), F.lit("e1")))
        .when(variant == 3, F.lit("nan"))
        .when(variant == 4, F.lit("inf"))
        .otherwise(F.concat(F.lit("x"), (F.col("l_orderkey") % 200).cast("long").cast("string")))
    )
    stop_lon = (F.col("l_partkey") % 400 - 200).cast("long").cast("string")
    loc_variant = F.col("l_suppkey") % 3
    location_type = (
        F.when(loc_variant == 0, F.lit(""))
        .when(loc_variant == 1, F.lit("1"))
        .otherwise(F.lit("station"))
    )
    return li.select(
        "l_returnflag",
        stop_lat.alias("stop_lat"),
        stop_lon.alias("stop_lon"),
        location_type.alias("location_type"),
    )


@register("a1_validation_quarantine_counts", A1_ORACLE)
def a1_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 coordinate cast-probe + P8 location-type + P10 split + A1 counts
    (publish_to_catalog.py:181-200, 335-342, 356-359) over a synthesized
    dirty stops table. The valid+invalid=total identity holds per group.
    """
    stops = _dirty_stops(spark, sf_dir)
    is_valid = V.coordinates_valid(F.col("stop_lat"), F.col("stop_lon")) & V.location_type_valid(
        F.col("location_type")
    )
    flagged = stops.withColumn("is_valid", is_valid)
    return CL.quarantine_counts(flagged, "l_returnflag")


P10_ORACLE = f"""
WITH stops AS ({_DIRTY_INPUT_SQL})
SELECT stop_lat, stop_lon, location_type
FROM stops
WHERE NOT (
  coalesce(TRY_CAST(stop_lat AS DOUBLE) BETWEEN -90 AND 90, FALSE)
  AND coalesce(TRY_CAST(stop_lon AS DOUBLE) BETWEEN -180 AND 180, FALSE)
  AND (trim(location_type) = '' OR TRY_CAST(location_type AS DOUBLE) IS NOT NULL)
)
"""


@register("p10_quarantine_rows", P10_ORACLE)
def p10_quarantine_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: the quarantine branch itself (publish_to_catalog.py:338-342) —
    invalid raw rows retained for audit, explicit badRecordsPath analog."""
    stops = _dirty_stops(spark, sf_dir)
    is_valid = V.coordinates_valid(F.col("stop_lat"), F.col("stop_lon")) & V.location_type_valid(
        F.col("location_type")
    )
    _, quarantine = V.split_valid_invalid(stops, is_valid)
    return quarantine.select("stop_lat", "stop_lon", "location_type")


# ---------------------------------------------------------------------------
# S6/F1/F2/F6: CSV-cell normalization semantics (clean_cell over dirty cells)
# ---------------------------------------------------------------------------

S6_ORACLE = """
WITH dirty AS (
  SELECT p_partkey,
         CASE p_partkey % 4
           WHEN 0 THEN '  ' || p_brand || '  '
           WHEN 1 THEN '"' || p_brand || '"'
           WHEN 2 THEN '''' || p_brand || ''''
           ELSE ' "' || p_brand || '" '
         END AS raw_cell,
         p_type AS raw_line
  FROM part
)
SELECT p_partkey,
       trim(trim(replace(raw_cell, '''', '"')), '"') AS cell_clean,
       string_split(raw_line, ' ')[1] AS first_field,
       len(string_split(raw_line, ' ')) AS n_fields
FROM dirty
"""


@register("s6_csv_cell_normalize", S6_ORACLE)
def s6_cell_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 ingest normalization semantics (publish_to_catalog.py:148-178)
    as oracle-checked column ops: padded / double-quoted / single-quoted /
    mixed cells all normalize to the bare value, and line splitting (F2)
    yields the field array. The file-based path (runtime header, BOM,
    short-row drop) is exercised in tests/test_sources.py; this query pins
    the cell-level semantics the driver gate can hash."""
    from ntd_gtfs_to_socrata_spark.sources.csv_ingest import clean_cell

    p = load_table(spark, sf_dir, "part")
    dirty = p.select(
        "p_partkey",
        F.when(F.col("p_partkey") % 4 == 0, F.concat(F.lit("  "), F.col("p_brand"), F.lit("  ")))
        .when(F.col("p_partkey") % 4 == 1, F.concat(F.lit('"'), F.col("p_brand"), F.lit('"')))
        .when(F.col("p_partkey") % 4 == 2, F.concat(F.lit("'"), F.col("p_brand"), F.lit("'")))
        .otherwise(F.concat(F.lit(' "'), F.col("p_brand"), F.lit('" ')))
        .alias("raw_cell"),
        F.col("p_type").alias("raw_line"),
    )
    return dirty.select(
        "p_partkey",
        clean_cell(F.col("raw_cell")).alias("cell_clean"),
        F.element_at(F.split("raw_line", " "), 1).alias("first_field"),
        F.size(F.split("raw_line", " ")).cast("long").alias("n_fields"),
    )


# ---------------------------------------------------------------------------
# P9 URL regex validity
# ---------------------------------------------------------------------------

P9_ORACLE = rf"""
WITH urls AS (
  SELECT c_custkey,
    CASE c_custkey % 3
      WHEN 0 THEN 'https://agency' || CAST(c_custkey AS VARCHAR) || '.example.com/gtfs.zip'
      WHEN 1 THEN 'notaurl' || CAST(c_custkey AS VARCHAR)
      ELSE 'http://agency' || CAST(c_custkey AS VARCHAR)
    END AS fetch_link
  FROM customer
)
SELECT regexp_matches(fetch_link, '{V.URL_REGEX}') AS url_ok, count(*) AS n
FROM urls GROUP BY url_ok
"""


@register("p9_url_validity", P9_ORACLE)
def p9_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 (publish_to_catalog.py:83-91): syntactic URL predicate, engine-
    portable regex (anchored, RE2-compatible)."""
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    url = (
        F.when(k % 3 == 0, F.concat(F.lit("https://agency"), k.cast("string"), F.lit(".example.com/gtfs.zip")))
        .when(k % 3 == 1, F.concat(F.lit("notaurl"), k.cast("string")))
        .otherwise(F.concat(F.lit("http://agency"), k.cast("string")))
    )
    return (
        c.select(url.alias("fetch_link"))
        .select(V.url_valid(F.col("fetch_link")).alias("url_ok"))
        .groupBy("url_ok")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# J1/J1a/J2: regex-extracted join key, broadcast resolution, routing
# ---------------------------------------------------------------------------

_CATALOG_SQL = """
  SELECT 'cat-' || CAST(s_suppkey AS VARCHAR) AS id,
    CASE WHEN s_suppkey % 2 = 0
      THEN 'Agency feed' || chr(10) || 'Feed ID: F' || CAST(s_suppkey AS VARCHAR) || chr(10) || 'tail'
      ELSE 'no marker here'
    END AS description
  FROM supplier
"""

J1_ORACLE = f"""
WITH catalog AS ({_CATALOG_SQL}),
keyed AS (
  SELECT id, regexp_extract(description, '\nFeed ID: (.+)\n', 1) AS feed_id
  FROM catalog
  WHERE regexp_extract(description, '\nFeed ID: (.+)\n', 1) <> ''
),
incoming AS (
  SELECT 'F' || CAST(c_custkey % 120 AS VARCHAR) AS feed_id, c_name AS agency_name
  FROM customer
),
resolved AS (
  SELECT i.feed_id, k.id,
         CASE WHEN k.id IS NULL THEN 'create' ELSE 'update' END AS action
  FROM incoming i LEFT JOIN keyed k USING (feed_id)
)
SELECT action, count(*) AS n_agencies, count(DISTINCT feed_id) AS n_feeds
FROM resolved GROUP BY action
"""


@register("j1_j2_feed_resolution_routing", J1_ORACLE)
def j1_j2_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1a regex key extraction (publish_to_catalog.py:137-145) + J1
    broadcast left join (L503-513) + J2 create/update routing (L536-543).

    The catalog side is a small dimension — broadcast hash join, so the
    incoming (big) side never shuffles. At 100 TB of incoming rows this
    stays a map-side join.
    """
    supplier = load_table(spark, sf_dir, "supplier")
    desc = F.when(
        F.col("s_suppkey") % 2 == 0,
        F.concat(
            F.lit("Agency feed\nFeed ID: F"),
            F.col("s_suppkey").cast("string"),
            F.lit("\ntail"),
        ),
    ).otherwise(F.lit("no marker here"))
    catalog = supplier.select(
        F.concat(F.lit("cat-"), F.col("s_suppkey").cast("string")).alias("id"),
        desc.alias("description"),
    )
    keyed = catalog.select(
        "id", K.extract_feed_id(F.col("description")).alias("feed_id")
    ).filter(F.col("feed_id") != "")

    customer = load_table(spark, sf_dir, "customer")
    incoming = customer.select(
        F.concat(F.lit("F"), (F.col("c_custkey") % 120).cast("string")).alias("feed_id"),
        F.col("c_name").alias("agency_name"),
    )
    resolved = M.resolve_by_key(incoming, keyed, key="feed_id")
    routed = M.route_create_update(resolved, "id")
    return routed.groupBy("action").agg(
        F.count(F.lit(1)).alias("n_agencies"),
        F.countDistinct("feed_id").alias("n_feeds"),
    )


# ---------------------------------------------------------------------------
# J3 deletion anti-join
# ---------------------------------------------------------------------------

J3_ORACLE = """
SELECT c_mktsegment, count(*) AS n_deletions
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
GROUP BY c_mktsegment
"""


@register("j3_deletion_anti_join", J3_ORACLE)
def j3_deletions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 (``locateDeletions``, publish_to_catalog.py:261-288): sink rows
    with no incoming counterpart ⇒ delete set, as a left-anti join.
    Incoming restricted to urgent orders so the delete set is non-empty."""
    customer = load_table(spark, sf_dir, "customer")
    incoming = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    deletions = M.locate_deletions(customer, incoming, key="c_custkey")
    return deletions.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n_deletions"))


J3B_ORACLE = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
WHERE l_orderkey NOT IN (
  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
GROUP BY l_returnflag, l_linestatus
"""


@register("j3b_bloom_prefilter_anti_join", J3B_ORACLE)
def j3b_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB scale sibling of J3 (``locateDeletions``,
    publish_to_catalog.py:261-288): deletion anti-join with a Bloom
    prefilter (operators/bloom.py). The deletion key set is compacted to
    a 65 536-bit mask (8 KB, independent of cardinality) and probed
    MAP-SIDE, so the ~80 % of lineitem rows that are definitely not
    deleted never enter a join — only possible-members (true members + a
    small false-positive tail) shuffle into the exact anti-join that
    resolves them. False negatives are impossible, so the composition is
    row-for-row the plain anti-join and the oracle is plain ``NOT IN``.
    This is the shape Spark's own runtime row-level filtering injects
    (bloom_filter_agg / might_contain — not in the public registry);
    here it is built from public primitives so the plan is explicit."""
    li = load_table(spark, sf_dir, "lineitem")
    deletions = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    survivors = B.bloom_anti_join(
        li, deletions, probe_key="l_orderkey", keys_key="o_orderkey"
    )
    return survivors.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# J4 upsert merge-by-key  /  J5 full sync
# ---------------------------------------------------------------------------

# floor(x*100) not round(): identical in both engines (round() half-case
# handling differs and totalprice*1.1 lands on half-cent boundaries often).
_EXISTING_SQL = """
  SELECT o_orderkey AS k, CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents,
         o_orderpriority AS prio
  FROM orders WHERE o_orderkey % 3 <> 0
"""
_INCOMING_SQL = """
  SELECT o_orderkey AS k, CAST(floor(o_totalprice * 110) AS BIGINT) AS price_cents,
         'UPDATED' AS prio
  FROM orders WHERE o_orderkey % 2 = 0
"""

def _merge_sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    orders = load_table(spark, sf_dir, "orders")
    existing = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.floor(F.col("o_totalprice") * 100).alias("price_cents"),
        F.col("o_orderpriority").alias("prio"),
    )
    incoming = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.floor(F.col("o_totalprice") * 110).alias("price_cents"),
        F.lit("UPDATED").alias("prio"),
    )
    return existing, incoming


J4_ORACLE = f"""
WITH existing AS ({_EXISTING_SQL}), incoming AS ({_INCOMING_SQL})
SELECT coalesce(i.k, e.k) AS k,
       coalesce(i.price_cents, e.price_cents) AS price_cents,
       coalesce(i.prio, e.prio) AS prio
FROM incoming i FULL OUTER JOIN existing e ON i.k = e.k
"""


@register("j4_upsert_merge", J4_ORACLE)
def j4_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 (publish_to_catalog.py:345-352): MERGE-by-key, incoming wins —
    plain-Spark union + per-key row_number; one shuffle on the key."""
    existing, incoming = _merge_sides(spark, sf_dir)
    return M.upsert(existing, incoming, key="k")


J5_ORACLE = f"""
WITH incoming AS ({_INCOMING_SQL})
SELECT k, price_cents, prio FROM incoming
"""


@register("j5_full_sync_snapshot", J5_ORACLE)
def j5_full_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 (publish_to_catalog.py:354): upsert + delete-absent ⇒ snapshot
    equals the (key-unique) incoming set — the idempotent-sync fixpoint the
    reference achieves with serial HTTP calls."""
    existing, incoming = _merge_sides(spark, sf_dir)
    return M.full_sync(existing, incoming, key="k")


# ---------------------------------------------------------------------------
# A2 last-write-wins changelog
# ---------------------------------------------------------------------------

A2_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_type, round(value, 2) AS last_value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_type, last_value FROM ranked WHERE rn = 1
"""


@register("a2_changelog_last_write_wins", A2_ORACLE)
def a2_last_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 (``updateChangeLog``, publish_to_catalog.py:93-124): dict-
    assignment last-write-wins per key → window dedupe; one shuffle on the
    changelog key, deterministic tiebreak on event_id."""
    events = load_table(spark, sf_dir, "events")
    latest = CL.last_write_wins(events, ["user_id", "event_type"], "ts", tiebreak="event_id")
    return latest.select(
        "user_id", "event_type", F.round(F.col("value"), 2).alias("last_value")
    )


# ---------------------------------------------------------------------------
# A3 run-summary action counts
# ---------------------------------------------------------------------------

A3_ORACLE = """
SELECT event_type AS action, count(DISTINCT user_id) AS n_feeds, count(*) AS n_entries
FROM events GROUP BY event_type
"""


@register("a3_run_summary_counts", A3_ORACLE)
def a3_action_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 (publish_to_catalog.py:554-563): per-action-category dict sizes →
    distinct counts per group."""
    events = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("action"), F.col("user_id").alias("feed_id")
    )
    return CL.action_counts(events)


# ---------------------------------------------------------------------------
# A4 error fold
# ---------------------------------------------------------------------------

A4_ORACLE = """
SELECT string_agg(line, chr(10) || chr(10) ORDER BY line) AS error_blob
FROM (
  SELECT CAST(user_id AS VARCHAR) || ': ' || CAST(event_id AS VARCHAR) AS line
  FROM events WHERE event_type = 'error'
)
"""


@register("a4_error_fold", A4_ORACLE)
def a4_error_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 (``stringifyErrorLines``, publish_to_catalog.py:547-551): fold all
    error lines into one blob; sorted for distributed determinism."""
    events = load_table(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("user_id").cast("string").alias("feed_id"),
        F.col("event_id").cast("string").alias("message"),
    )
    return CL.fold_errors(errors, id_col="feed_id", msg_col="message")


# ---------------------------------------------------------------------------
# A1b bus_numbers map: per-feed dict of per-route counts
# ---------------------------------------------------------------------------

A1B_ORACLE = """
WITH per_route AS (
  SELECT user_id, coalesce(event_type, 'unknown') AS route, count(*) AS n_stops
  FROM events GROUP BY user_id, coalesce(event_type, 'unknown')
)
SELECT user_id, route, n_stops,
       count(*) OVER (PARTITION BY user_id) AS n_routes
FROM per_route
"""


@register("a1b_bus_numbers_map", A1B_ORACLE)
def a1b_bus_numbers_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1b (``busLineDict``, publish_to_catalog.py:356-365): the per-feed
    category→count dict the reference stuffs into each changelog entry,
    as a first-class ``MAP<STRING,BIGINT>`` aggregation. The map is built
    distributed (bus_numbers operator), then exploded back to rows for the
    value-hash gate — `size()` of the map rides along so the map itself,
    not just its entries, is oracle-checked."""
    events = load_table(spark, sf_dir, "events")
    feeds = events.select("user_id", F.col("event_type").alias("route"))
    m = CL.bus_numbers(feeds, "user_id", "route")
    return m.select(
        "user_id",
        F.size("bus_numbers").cast("long").alias("n_routes"),
        F.explode("bus_numbers").alias("route", "n_stops"),
    )


# ---------------------------------------------------------------------------
# J8 snapshot diff (CDC extract): old vs new full snapshots → change set
# ---------------------------------------------------------------------------

SNAPSHOT_DIFF_ORACLE = """
WITH old_snap AS (
  SELECT o_orderkey AS k, CAST(floor(o_totalprice * 100) AS BIGINT) AS v
  FROM orders WHERE o_orderkey % 10 <> 0
),
new_snap AS (
  SELECT o_orderkey AS k,
         CAST(floor(o_totalprice * 100) AS BIGINT)
           + CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END AS v
  FROM orders WHERE o_orderkey % 9 <> 0
)
SELECT CASE WHEN o.k IS NULL THEN 'insert'
            WHEN n.k IS NULL THEN 'delete'
            WHEN o.v <> n.v THEN 'update'
            ELSE 'unchanged' END AS change,
       count(*) AS n_rows
FROM old_snap o FULL OUTER JOIN new_snap n ON o.k = n.k
GROUP BY change
"""


@register("j8_snapshot_diff", SNAPSHOT_DIFF_ORACLE)
def j8_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: change-data extraction between two full snapshots — the
    generalization of the reference's sync semantics (locate_deletions +
    upsert, publish_to_catalog.py:486-528, operators/merge.py) into one
    FULL OUTER join classifying insert/delete/update/unchanged. The two
    snapshots here are deterministic filters of `orders` (keys %10 vs %9,
    values perturbed on %7) so the oracle sees identical inputs.

    Scale posture: ONE co-partitioned sort-merge join on the key — both
    snapshots shuffle once; with both snapshots bucketed on the key
    (io.write_bucketed) the exchange disappears entirely. This subsumes
    the reference's separate delete-scan + upsert passes."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    old_snap = o.filter(F.col("o_orderkey") % 10 != 0).select(
        F.col("o_orderkey").alias("k"), cents.alias("v")
    )
    new_snap = o.filter(F.col("o_orderkey") % 9 != 0).select(
        F.col("o_orderkey").alias("k"),
        (cents + F.when(F.col("o_orderkey") % 7 == 0, 1).otherwise(0)).alias("v"),
    )
    return (
        M.snapshot_diff(old_snap, new_snap, key="k", value="v")
        .groupBy("change")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


# ---------------------------------------------------------------------------
# A2b SCD Type-2 history (the versioned generalization of last-write-wins)
# ---------------------------------------------------------------------------

SCD2_ORACLE = """
SELECT user_id, event_type, event_id, round(value, 2) AS value,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       CAST(row_number() OVER w AS BIGINT) AS version,
       (lead(ts) OVER w IS NULL) AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC)
"""


@register("a2b_scd2_history", SCD2_ORACLE)
def a2b_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2b: the full SCD Type-2 version history behind A2's dict-overwrite
    semantics (publish_to_catalog.py:93-124 keeps only the winner; a
    warehouse keeps every version with its validity interval).
    `a2_changelog_last_write_wins` ≡ this filtered to is_current — the
    operator (operators/changelog.py scd2_history) exposes both."""
    events = load_table(spark, sf_dir, "events")
    hist = CL.scd2_history(events, ["user_id", "event_type"], "ts", tiebreak="event_id")
    return hist.select(
        "user_id",
        "event_type",
        "event_id",
        F.round("value", 2).alias("value"),
        "valid_from",
        "valid_to",
        F.col("version").cast("long").alias("version"),
        "is_current",
    )


# ---------------------------------------------------------------------------
# J8b incremental aggregate maintenance (materialized view + CDC delta)
# ---------------------------------------------------------------------------

INCR_AGG_ORACLE = """
WITH new_snap AS (
  SELECT o_orderkey AS k, o_orderpriority AS g,
         CAST(floor(o_totalprice * 100) AS BIGINT)
           + CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END AS v
  FROM orders WHERE o_orderkey % 9 <> 0
)
SELECT g, CAST(sum(v) AS BIGINT) AS sum_v, count(*) AS n_rows
FROM new_snap GROUP BY g
"""


@register("j8b_incremental_agg", INCR_AGG_ORACLE)
def j8b_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8b: incremental materialized-view maintenance — the aggregate over
    the NEW snapshot is produced WITHOUT rescanning it as a whole: stored
    MV(old) ⊕ group-delta(CDC stream), where the delta retracts v_old and
    applies v_new per change row (insert/delete/update). The oracle computes
    the same aggregate by full recompute over the new snapshot, so the hash
    match IS the maintenance-correctness proof.

    Scale posture: at 100 TB the old snapshot is never rescanned — only the
    delta (typically ≪1% of rows) shuffles on the group key, and the stored
    MV (|groups| rows) joins it full-outer. This is the Delta/iceberg
    MERGE-to-rollup pattern the reference's serial re-publish loop
    (publish_to_catalog.py:486-528) cannot express."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    old_snap = o.filter(F.col("o_orderkey") % 10 != 0).select(
        F.col("o_orderkey").alias("k"), F.col("o_orderpriority").alias("g"), cents.alias("v")
    )
    new_snap = o.filter(F.col("o_orderkey") % 9 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("g"),
        (cents + F.when(F.col("o_orderkey") % 7 == 0, 1).otherwise(0)).alias("v"),
    )
    # the stored MV (in production: read back, not recomputed)
    mv_old = old_snap.groupBy("g").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")
    )
    delta = M.snapshot_delta(old_snap, new_snap, key="k", value="v", carry=("g",))
    d = delta.groupBy("g").agg(
        F.sum(
            F.when(F.col("change") == "insert", F.col("v_new"))
            .when(F.col("change") == "delete", -F.col("v_old"))
            .when(F.col("change") == "update", F.col("v_new") - F.col("v_old"))
            .otherwise(F.lit(0))
        ).alias("ds"),
        F.sum(
            F.when(F.col("change") == "insert", 1)
            .when(F.col("change") == "delete", -1)
            .otherwise(0)
        ).alias("dc"),
    )
    maintained = (
        mv_old.join(d, "g", "full_outer")
        .select(
            "g",
            (F.coalesce("s", F.lit(0)) + F.coalesce("ds", F.lit(0))).alias("sum_v"),
            (F.coalesce("c", F.lit(0)) + F.coalesce("dc", F.lit(0))).alias("n_rows"),
        )
        .filter(F.col("n_rows") > 0)
    )
    return maintained


# ---------------------------------------------------------------------------
# J8c: incremental JOIN maintenance (the IVM delta decomposition)
# ---------------------------------------------------------------------------

IVM_JOIN_ORACLE = """
SELECT o.o_orderkey, l.l_linenumber, o.o_orderpriority,
       CAST(l.l_quantity AS DOUBLE) AS l_quantity
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey % 11 = 0 OR l.l_orderkey % 13 = 0
"""


@register("j8c_incremental_join_delta", IVM_JOIN_ORACLE)
def j8c_incremental_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a JOIN view: with inserts ΔA to
    orders and ΔB to lineitem, the view delta is the classic three-term
    decomposition  Δ(A⋈B) = ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB  — three joins
    whose LEFT inputs are delta-sized, instead of re-joining two full
    tables (the j8b aggregation-maintenance story, now for joins). The
    oracle states the declarative truth (full join where either side is
    new), so the value-hash PROVES the decomposition's three disjoint
    terms tile the delta exactly.

    Scale posture: ΔA and ΔB broadcast (delta-sized by definition of an
    incremental batch), so maintaining the view costs two broadcast
    probes of the big tables' NEW data only + one delta×delta join — the
    full A_old⋈B_old result is never recomputed. At 100 TB the old
    sides' probes prune further by join-key partition/bucket layout
    (io.write_bucketed)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", (F.col("o_orderkey") % 11 == 0).alias("is_new")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("l_quantity"),
        (F.col("l_orderkey") % 13 == 0).alias("is_new_l"),
    )
    a_old = orders.filter(~F.col("is_new")).drop("is_new")
    d_a = orders.filter(F.col("is_new")).drop("is_new")
    b_old = li.filter(~F.col("is_new_l")).drop("is_new_l")
    d_b = li.filter(F.col("is_new_l")).drop("is_new_l")
    on = F.col("o_orderkey") == F.col("l_orderkey")
    cols = ["o_orderkey", "l_linenumber", "o_orderpriority", "l_quantity"]
    t1 = F.broadcast(d_a).join(b_old, on).select(*cols)
    t2 = a_old.join(F.broadcast(d_b), on).select(*cols)
    t3 = F.broadcast(d_a).join(d_b, on).select(*cols)
    return t1.unionAll(t2).unionAll(t3)
