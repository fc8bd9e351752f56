"""Table catalog over the driver-generated parquet directories.

Loads the TPC-H-ish star schema + events/documents/embeddings tables
(TESTDATA.md) as DataFrames.  All scans are plain ``spark.read.parquet`` so
Catalyst keeps predicate pushdown / column pruning / partition pruning —
at 100 TB these scans become multi-file distributed reads with no code
change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreamsjavachallenge_spark.session import configure_runtime

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table; normalizes the events nanosecond timestamp.

    events.ts arrives as parquet TIMESTAMP(NANOS) read as long nanos
    (see session._RUNTIME_CONFS); convert with integer division so the
    truncation to microseconds matches DuckDB's read of the same file.
    """
    configure_runtime(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table in the scale-factor directory."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register temp views so queries can also be issued via spark.sql."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
