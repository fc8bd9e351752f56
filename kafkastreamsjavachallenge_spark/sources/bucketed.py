"""Bucketed-table storage: pre-shuffled on-disk layout for co-located joins.

The reference pre-partitions its Kafka topics by key so per-minute state is
task-local (README.md:90-105).  The batch-world equivalent is bucketing:
``bucketBy(n, key)`` writes each bucket as its own file set, recording the
layout in the catalog; a join of two tables bucketed on the same key with
the same bucket count needs NO exchange on either side — at 100 TB this
removes the dominant shuffle of fact-fact joins, paying the shuffle once at
write time instead of per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) table.

    Sorting within buckets additionally removes the per-task sort of a
    sort-merge join (SMJ reads pre-sorted bucket files).
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-key/same-count bucketed tables — shuffle-free.

    The physical plan must show zero Exchange operators; tests pin this
    (tests/test_plans.py::test_bucketed_join_has_no_exchange).
    """
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
