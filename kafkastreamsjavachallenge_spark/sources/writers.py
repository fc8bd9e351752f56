"""Batch writers: partitioned layouts that make 100 TB scans prunable.

The knob hierarchy for a large table on disk:
- ``partitionBy`` on a *low-cardinality, always-filtered* column (a date
  derivative) → directory-level partition pruning: a day-filtered query
  reads 1/365th of the files before any row is touched.
- ``bucketBy`` on the dominant join/agg key (sources/bucketed.py) →
  shuffle-free joins.
- Within files, sort by a secondary predicate column → parquet min/max
  row-group skipping.

``write_time_partitioned`` is the canonical events layout: one directory
per day, bucket-file sizing left to Spark (AQE-coalesced upstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    granularity: str = "day",
    mode: str = "overwrite",
) -> None:
    """Write parquet partitioned by a date derivative of ``ts_col``.

    The partition column is added (not replacing the timestamp), so readers
    keep full event-time fidelity while scans prune on the directory key.
    """
    part_col = f"p_{granularity}"
    out = df.withColumn(
        part_col, F.date_format(F.date_trunc(granularity, F.col(ts_col)), "yyyy-MM-dd")
    )
    out.write.mode(mode).partitionBy(part_col).parquet(path)


def compact(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 128,
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ~``target_file_mb`` files.

    Streaming file sinks and fine-grained partitioning both accrete small
    files; at scale the scan-planning cost (one task + footer read per
    file) dominates long before data volume does.  File count is sized
    from the on-disk bytes; the rewrite is a round-robin repartition (no
    key skew, parallel write).  Returns the output file count.
    """
    import math

    from pyspark.sql.functions import spark_partition_id  # noqa: F401

    df = spark.read.parquet(src_path)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(src_path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    size = fs.getContentSummary(jvm_path).getLength()
    n_files = max(1, math.ceil(size / (target_file_mb * 1024 * 1024)))
    df.repartition(n_files).write.mode("overwrite").parquet(dst_path)
    return n_files


def read_pruned(
    spark: SparkSession,
    path: str,
    granularity: str = "day",
    day: str | None = None,
) -> DataFrame:
    """Read a time-partitioned table; an exact-day filter prunes at the
    directory level (the plan's PartitionFilters — pinned by tests)."""
    df = spark.read.parquet(path)
    if day is not None:
        df = df.filter(F.col(f"p_{granularity}") == day)
    return df
