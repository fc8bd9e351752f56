"""Streaming parity tests (SURVEY.md §5.2): multi-batch micro-batch
execution must converge to the batch result; update vs append emission
semantics mirror SURVEY.md §1.3.2."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafkastreamsjavachallenge_spark.catalog import load_table
from kafkastreamsjavachallenge_spark.operators.windows import unique_users
from kafkastreamsjavachallenge_spark.streaming.pipeline import (
    file_stream,
    run_to_memory,
    streaming_unique_users,
)

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def event_files(spark, tmp_path_factory):
    """events split into 4 parquet files ordered by time — so micro-batches
    arrive roughly in event-time order and the watermark advances between
    batches (late rows within a batch still exercise out-of-order paths)."""
    d = str(tmp_path_factory.mktemp("event_stream"))
    ev = load_table(spark, SF_DIR, "events").orderBy("ts")
    n = ev.count()
    pdf = ev.toPandas()
    import pyarrow as pa
    import pyarrow.parquet as pq

    chunk = (n + 3) // 4
    for i in range(4):
        part = pdf.iloc[i * chunk : (i + 1) * chunk]
        pq.write_table(
            pa.Table.from_pandas(part),
            os.path.join(d, f"f{i}.parquet"),
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
    return d, ev


def test_multibatch_update_converges_to_batch(spark, event_files):
    d, ev = event_files
    stream = file_stream(spark, d, ev.schema, max_files_per_trigger=1)
    result = streaming_unique_users(stream, "ts", "user_id", "1 minute", "1 minute")
    table = run_to_memory(result, output_mode="update")
    final = table.groupBy("window_start").agg(
        F.max("unique_users").alias("unique_users")
    )
    got = {r["window_start"]: r["unique_users"] for r in final.collect()}
    want = {
        r["window_start"]: r["unique_users"]
        for r in unique_users(ev, "ts", "user_id").collect()
    }
    assert got == want


def test_multibatch_append_emits_closed_windows_only(spark, event_files):
    """Append mode = the suppression the reference wanted (X1): emitted
    windows are exactly those the watermark closed, each with its final
    count; the tail stays open."""
    d, ev = event_files
    stream = file_stream(spark, d, ev.schema, max_files_per_trigger=1)
    result = streaming_unique_users(stream, "ts", "user_id", "1 minute", "1 minute")
    table = run_to_memory(result, output_mode="append")
    got = {r["window_start"]: r["unique_users"] for r in table.collect()}
    want = {
        r["window_start"]: r["unique_users"]
        for r in unique_users(ev, "ts", "user_id").collect()
    }
    assert 0 < len(got) <= len(want)
    # every emitted window is final-correct; no window emitted twice
    assert all(want[w] == n for w, n in got.items())
    # un-emitted windows are only at the (still-open) tail of event time
    open_windows = sorted(set(want) - set(got))
    assert all(w > max(got) for w in open_windows)
