"""Query registry: every SURVEY.md §2 query id → (Spark callable, DuckDB
oracle SQL).

Each Spark callable has signature ``(spark, sf_dir) -> DataFrame`` and every
computed column is aliased identically in the Spark plan and the oracle SQL
(driver compares row-count + schema + order-insensitive value hash).
Oracle ``None`` → non-SQL-expressible (approximate/streaming-only) →
driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafkastreamsjavachallenge_spark.queries import (
    analytics,
    applied,
    breadth,
    core,
    extended,
    graphs,
    llm,
    quality,
    relational,
    streaming_q,
    timeseries,
)

_MODULES = (
    core,
    relational,
    extended,
    analytics,
    breadth,
    applied,
    graphs,
    timeseries,
    quality,
    llm,
    streaming_q,
)


def registry() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    out: dict[str, tuple] = {}
    for m in _MODULES:
        for name, spec in m.QUERIES.items():
            assert name not in out, f"duplicate query id {name}"
            out[name] = spec
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in registry().items() if sql is not None}
