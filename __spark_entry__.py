"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship unique-users-per-minute on sf0.001 (smoke).
queries()     — every implemented SURVEY.md §2 query id.
oracle_sql()  — matching DuckDB ANSI SQL (omitted for approximate /
                streaming-suppression queries → rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafkastreamsjavachallenge_spark import queries as _q
from kafkastreamsjavachallenge_spark.queries.core import q_unique_users

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_unique_users(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
