"""Loader contract: ``load_table`` returns a stable logical schema for every
fixture table at every scale factor.

This is the canary the round-3/4 events outage proved we need: the fixture
generator changed ``events.ts`` from TIMESTAMP(NANOS) to ``timestamp[us]``
and the loader's hard-coded physical-type workaround broke ~18 queries with
only 4 driver-visible failures. With this test, the next silent fixture
drift becomes a named one-line failure instead of an 18-query outage.

The contract below is the loader's *logical* schema — what every query in
the registry codes against — captured from the current-known-good state.
If a fixture regeneration changes a physical type the loader is expected
to keep normalizing it (as ``_load_events`` does for ts); if it changes
the logical shape, this test names the drift and the affected table.
"""

from __future__ import annotations

import os

import pytest

from ntd_gtfs_to_socrata_spark.io import TABLES, load_table

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

# table -> [(column, spark simpleString type), ...] in order. `events.ts`
# is the one column the loader actively normalizes (any physical encoding
# -> session-TZ timestamp); everything else passes through the parquet
# logical type.
EXPECTED_SCHEMA = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [("n_nationkey", "int"), ("n_name", "string"), ("n_regionkey", "int")],
    "customer": [
        ("c_custkey", "bigint"), ("c_name", "string"), ("c_nationkey", "int"),
        ("c_acctbal", "double"), ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"), ("s_name", "string"), ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"), ("p_name", "string"), ("p_brand", "string"),
        ("p_type", "string"), ("p_size", "int"), ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"), ("o_custkey", "bigint"),
        ("o_orderstatus", "string"), ("o_totalprice", "double"),
        ("o_orderdate", "timestamp_ntz"), ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"), ("l_partkey", "bigint"),
        ("l_suppkey", "bigint"), ("l_linenumber", "int"),
        ("l_quantity", "double"), ("l_extendedprice", "double"),
        ("l_discount", "double"), ("l_tax", "double"),
        ("l_returnflag", "string"), ("l_linestatus", "string"),
        ("l_shipdate", "timestamp_ntz"),
    ],
    "events": [
        ("event_id", "bigint"), ("ts", "timestamp"), ("user_id", "bigint"),
        ("event_type", "string"), ("value", "double"), ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"), ("text", "string"), ("lang", "string"),
        ("source", "string"), ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"), ("embedding", "array<float>"), ("label", "int"),
    ],
}


def test_contract_covers_every_table():
    assert set(EXPECTED_SCHEMA) == set(TABLES)


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=lambda d: os.path.basename(d))
@pytest.mark.parametrize("table", TABLES)
def test_load_table_schema_contract(spark, sf_dir, table):
    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} not present")
    df = load_table(spark, sf_dir, table)
    actual = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    assert actual == EXPECTED_SCHEMA[table], (
        f"{table}@{sf_dir}: loader schema drifted.\n"
        f"  surfaced: {actual}\n"
        f"  contract: {EXPECTED_SCHEMA[table]}\n"
        "If the fixture's physical type changed, normalize it in the loader "
        "(see _load_events); if the logical shape changed, update every "
        "query that reads this table, then this contract."
    )


def test_events_loader_yields_scannable_timestamps(spark):
    """The normalized events table is actually executable end-to-end —
    the exact failure mode of the r3/r4 outage (analysis passed schema
    checks but threw at plan resolution)."""
    import datetime

    df = load_table(spark, "/root/testdata/sf0.001", "events")
    row = df.orderBy("event_id").limit(1).collect()
    assert row, "events fixture is empty"
    assert isinstance(row[0]["ts"], datetime.datetime)
