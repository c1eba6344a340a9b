"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`blockchain_etl_spark.plans.registry` — the single
source of truth for the engine's query surface. The driver's verify runs
``entry(spark)`` as a smoke check, runs each ``queries()[name]`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the account-activity
    composition (SURVEY §7.3 — P4 actor extraction → J4 txn join → A6
    amount rollup → W1 latest-state window with bookkeeping)."""
    from blockchain_etl_spark.plans.registry import get_queries

    return get_queries()["account_activity_flagship"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from blockchain_etl_spark.plans.registry import get_queries

    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each queries() entry (where SQL can
    express it; engine-specific outputs like JSON serialization are
    rows-only)."""
    from blockchain_etl_spark.plans.registry import get_oracle_sql

    return get_oracle_sql()
