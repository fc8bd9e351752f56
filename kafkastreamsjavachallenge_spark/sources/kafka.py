"""Kafka source/sink wiring — the reference's S1/S2 surface
(UniqueUsersApp.java:92,133; config.properties:1-5).

The log-frames record contract (README.md:18-23): JSON values
``{"ts": <unix-seconds>, "uid": "..."}``; the reference takes event time
from the stringified-minute *key* (LogFrameTimestampExtractor.java:8-14) —
we take it from the payload ``ts`` (authoritative upstream, README.md:111)
and filter malformed rows instead of epoch-0 sentinels (SURVEY.md §1.3.3).

No broker exists in the test container, so these builders are exercised for
plan construction only; end-to-end micro-batch behavior is covered by the
file source (streaming/pipeline.py), which shares every operator downstream
of the source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

LOG_FRAME_SCHEMA = StructType(
    [
        StructField("ts", LongType()),  # unix seconds (README.md:23)
        StructField("uid", StringType()),
    ]
)


def read_log_frames(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S1: subscribe to the log-frames topic and parse the JSON value.

    Returns columns (ts: timestamp, uid: string), malformed records dropped
    — the Spark-first form of processRecord + filterNot
    (UniqueUsersApp.java:113-114,206-216).
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_log_frames(raw)


def parse_log_frames(raw: DataFrame) -> DataFrame:
    """value bytes → typed (ts, uid); shared by Kafka and test sources."""
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), LOG_FRAME_SCHEMA).alias("j")
    )
    return (
        parsed.select(
            F.timestamp_seconds(F.col("j.ts")).alias("ts"),
            F.col("j.uid").alias("uid"),
        )
        .filter(F.col("ts").isNotNull() & F.col("uid").isNotNull() & (F.col("uid") != ""))
    )


def write_counts(
    result: DataFrame,
    brokers: str,
    topic: str,
    checkpoint: str,
    output_mode: str = "update",
):
    """S2: produce (key = window-start unix-seconds string, value = count
    string) — the reference's output record shape
    (UniqueUsersApp.java:125,130,133)."""
    out = result.select(
        F.unix_timestamp("window_start").cast("string").alias("key"),
        F.col("unique_users").cast("string").alias("value"),
    )
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .start()
    )
