"""Golden-output test: reproduce the reference's README golden table shape
(/root/reference/README.md:63-83) from a synthesized log-frames fixture.

The reference's only published behavioral artifact is a 17-row table of
(dateMinute, uniqueUsers, tsMinute) produced by its batch spark-shell
oracle (README.md:55-56) over a sample log-frames file.  The sample file
itself is not in the repo, so we synthesize a fixture with the reference's
own injection-script shape (README.md:169-185: incrementing uids, fixed
time step) where the expected per-minute unique counts are known in closed
form, then check the engine's flagship pipeline — batch AND streaming —
reproduces them exactly.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from kafkastreamsjavachallenge_spark.operators.windows import unique_users
from kafkastreamsjavachallenge_spark.sources.kafka import parse_log_frames
from kafkastreamsjavachallenge_spark.streaming.pipeline import (
    file_stream,
    run_to_memory,
    streaming_unique_users,
)

BASE_TS = 1468244340  # 2016-07-11 14:39:00 UTC — the golden table's epoch


@pytest.fixture(scope="module")
def log_frames_path(tmp_path_factory):
    """17 minutes of log frames: minute m gets one event every 2 s with
    uid = i % (m+1)*10 → expected unique count per minute = min(30, (m+1)*10).
    Duplicates within the minute exercise the dedup path; a malformed line
    and an empty-uid line exercise the filter path (UniqueUsersApp.java:212-215).
    """
    d = tmp_path_factory.mktemp("log_frames")
    path = os.path.join(d, "frames.json")
    with open(path, "w") as f:
        for m in range(17):
            n_unique = (m + 1) * 10
            for i in range(30):  # 30 events per minute, every 2 s
                ts = BASE_TS + m * 60 + i * 2
                uid = f"u{i % n_unique:04d}"
                f.write(json.dumps({"ts": ts, "uid": uid, "extra": "ignored"}) + "\n")
        f.write("this is not json\n")
        f.write(json.dumps({"ts": BASE_TS, "uid": ""}) + "\n")
    return path


def expected_counts():
    return {m: min(30, (m + 1) * 10) for m in range(17)}


def _golden_view(df):
    """README.md:55-56 output shape: (date_minute, unique_users, ts_minute)."""
    return df.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:00").alias("date_minute"),
        "unique_users",
        F.unix_timestamp("window_start").alias("ts_minute"),
    )


def test_batch_golden(spark, log_frames_path):
    raw = spark.read.text(log_frames_path).withColumnRenamed("value", "value")
    frames = parse_log_frames(raw)
    got = {
        r["ts_minute"]: r["unique_users"]
        for r in _golden_view(unique_users(frames, "ts", "uid")).collect()
    }
    want = {BASE_TS + m * 60: n for m, n in expected_counts().items()}
    assert got == want


def test_streaming_golden_update_mode(spark, log_frames_path):
    """The shipped reference behavior (update mode, cache=0): final state of
    the changelog equals the batch golden counts."""
    raw = file_stream(spark, os.path.dirname(log_frames_path), "value STRING", fmt="text")
    result = streaming_unique_users(parse_log_frames(raw), "ts", "uid")
    table = run_to_memory(result, output_mode="update")
    # changelog: keep the last emission per window
    final = (
        table.groupBy("window_start")
        .agg(F.max("unique_users").alias("unique_users"))
    )
    got = {
        r["ts_minute"]: r["unique_users"] for r in _golden_view(final).collect()
    }
    want = {BASE_TS + m * 60: n for m, n in expected_counts().items()}
    assert got == want
