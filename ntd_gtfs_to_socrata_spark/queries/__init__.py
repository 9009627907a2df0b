"""Query registry — the driver-contract surface.

Every implemented operator from SURVEY.md §2 registers here as
``name -> (fn(spark, sf_dir) -> DataFrame, oracle_sql | None)``.
``__spark_entry__.py`` re-exports this registry as ``queries()`` /
``oracle_sql()``.

Conventions (driver compare is row-count + schema + order-insensitive
value hash):
- alias EVERY computed column identically in Spark code and oracle SQL;
- floating aggregates are ``round(x, 2)`` on both sides so partial-agg
  summation order (Spark shuffles vs DuckDB) cannot flip low-order bits;
- counts stay BIGINT on both sides;
- collected lists are sorted before join/aggregation (order-insensitive).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
# Oracles that need a Python scalar registered in DuckDB (e.g. zlib_len
# for text_compression_ratio). The DRIVER's harness runs plain DuckDB, so
# these are NOT exported through __spark_entry__.oracle_sql() — the entry
# stays rows-only there. tools/check_oracle.py registers the UDFs (see
# duck_con) and checks these at FULL value-hash strength locally; if the
# driver harness ever grows duckdb.create_function support, moving a
# query here into ORACLES is a one-line change.
LOCAL_ORACLES: dict[str, str] = {}


def register(
    name: str,
    oracle: Optional[str] = None,
    local_oracle: Optional[str] = None,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        if local_oracle is not None:
            LOCAL_ORACLES[name] = local_oracle
        return fn

    return deco


def load_all_query_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    from ntd_gtfs_to_socrata_spark.queries import (  # noqa: F401
        dedup_text,
        entity_res,
        graph_q,
        layout_q,
        multimodal_q,
        privacy_q,
        reference_ops,
        relational,
        release_q,
        retrieval_q,
        similarity_q,
        sources_sinks_q,
        stats_q,
        streaming_q,
        subqueries,
        time_windows,
        tokenizer_q,
        tpch_deep,
        training_prep,
    )
