"""t1-smoke analog: the driver contract surface."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "n_rows" in df.columns


def test_registry_consistency():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "registry must not be empty"
    # every oracle key must have a query
    assert set(oracles) <= set(qs)


def test_every_rows_only_entry_has_a_documented_reason():
    """r12 verdict item 3: a rows-only entry is either value-hash-checked
    at LOCAL_ORACLES tier (Python-scalar DuckDB oracle) or carries a
    one-line reason in ROWS_ONLY_REASONS — silent rows-only coverage is
    not allowed. Reasons for oracled entries would be dead text, so the
    partition must be exact."""
    from ntd_gtfs_to_socrata_spark.queries import (
        LOCAL_ORACLES,
        ORACLES,
        REGISTRY,
        ROWS_ONLY_REASONS,
    )

    unchecked = set(REGISTRY) - set(ORACLES) - set(LOCAL_ORACLES)
    assert unchecked == set(ROWS_ONLY_REASONS), (
        f"missing reasons: {sorted(unchecked - set(ROWS_ONLY_REASONS))}; "
        f"stale reasons: {sorted(set(ROWS_ONLY_REASONS) - unchecked)}"
    )


def test_all_queries_run_smoke(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
