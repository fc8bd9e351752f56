"""Streaming queries surfaced in the batch harness: the reference topology
executed by the Structured Streaming engine over a file micro-batch source,
results drained through a memory sink.

``q_stream_unique_users`` (update mode, single availableNow batch) emits
final counts for every window → identical to the batch flagship → full
DuckDB oracle.  ``q_stream_unique_users_append`` shows suppressed
emit-on-close semantics (X1): with a single batch the watermark never
advances past the data, so nothing is emitted — the changelog-vs-final
distinction the reference documents at README.md:132-136 → rows-only.
Multi-batch incremental behavior is covered in tests/test_streaming.py.
"""

from __future__ import annotations

from kafkastreamsjavachallenge_spark.catalog import load_table
from kafkastreamsjavachallenge_spark.streaming.pipeline import (
    file_stream,
    run_to_memory,
    streaming_unique_users,
)


def _event_stream(spark, sf_dir):
    # The file stream source requires a directory: stage a symlink dir
    # (testdata is read-only; no data is copied).
    import os
    import tempfile

    from pyspark.sql import functions as F

    src = os.path.realpath(f"{sf_dir}/events.parquet")
    stage = tempfile.mkdtemp(prefix="stream_events_")
    os.symlink(src, os.path.join(stage, "part-00000.parquet"))

    batch = spark.read.parquet(src)  # schema donor
    stream = file_stream(spark, stage, batch.schema)
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return stream


def q_stream_unique_users(spark, sf_dir):
    result = streaming_unique_users(_event_stream(spark, sf_dir))
    return run_to_memory(result, output_mode="update")


def q_stream_unique_users_append(spark, sf_dir):
    result = streaming_unique_users(_event_stream(spark, sf_dir))
    return run_to_memory(result, output_mode="append")


QUERIES = {
    "q_stream_unique_users": (
        q_stream_unique_users,
        "SELECT date_trunc('minute', ts) AS window_start, "
        "count(DISTINCT user_id) AS unique_users FROM events GROUP BY 1",
    ),
    "q_stream_unique_users_append": (q_stream_unique_users_append, None),
}
