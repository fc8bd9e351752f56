"""DLQ ingest contract (sources/textual.py): PERMISSIVE text readers
capture every malformed line verbatim instead of crashing (FAILFAST) or
silently dropping (DROPMALFORMED / the reference's uid="" quirk at
UniqueUsersApp.java:212-215)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from kafkastreamsjavachallenge_spark.sources.textual import (
    CORRUPT_COL,
    read_csv,
    read_jsonl,
    split_dlq,
)

LOG_SCHEMA = StructType(
    [
        StructField("ts", LongType()),
        StructField("uid", StringType()),
    ]
)


def _write(path, lines):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_jsonl_dlq_captures_malformed_lines(spark, tmp_path):
    """3 good log frames, 3 broken ones (truncated JSON, bare text,
    type-garbage braces): good side parses exactly the 3, dlq side holds
    the 3 raw lines verbatim for replay."""
    p = str(tmp_path / "frames.jsonl")
    good_lines = [
        '{"ts": 1600000000, "uid": "a"}',
        '{"ts": 1600000060, "uid": "b"}',
        '{"ts": 1600000120, "uid": "c"}',
    ]
    bad_lines = [
        '{"ts": 1600000180, "uid": ',  # truncated
        "not json at all",
        "{]",
    ]
    _write(p, good_lines + bad_lines)
    good, dlq = split_dlq(read_jsonl(spark, p, LOG_SCHEMA))
    assert CORRUPT_COL not in good.columns
    assert sorted(r["uid"] for r in good.collect()) == ["a", "b", "c"]
    assert sorted(r["raw"] for r in dlq.collect()) == sorted(bad_lines)


def test_jsonl_dlq_feeds_flagship_topology(spark, tmp_path):
    """End-to-end: dirty JSONL -> DLQ split -> unique-users flagship.
    The 2 malformed lines are quarantined, and the count reflects ONLY
    parsed frames — no uid="" ghost rows (the reference quirk)."""
    from kafkastreamsjavachallenge_spark.operators.windows import unique_users

    p = str(tmp_path / "frames.jsonl")
    lines = [
        '{"ts": 1600000000, "uid": "u1"}',
        '{"ts": 1600000001, "uid": "u2"}',
        '{"ts": 1600000002, "uid": "u1"}',
        "garbage",
        '{"ts": 1600000060, "uid": "u1"}',
        '{"broken": ',
    ]
    _write(p, lines)
    good, dlq = split_dlq(read_jsonl(spark, p, LOG_SCHEMA))
    framed = good.select(
        F.timestamp_seconds(F.col("ts")).alias("ts"), "uid"
    )
    out = {
        r["window_start"]: r["unique_users"]
        for r in unique_users(framed, "ts", "uid").collect()
    }
    assert list(out.values()) == [2, 1] or sorted(out.values()) == [1, 2]
    assert dlq.count() == 2


def test_csv_dlq_captures_ragged_and_typed_rows(spark, tmp_path):
    """CSV with a ragged row and a type-garbage row: both land in the
    dlq verbatim; clean rows parse with their declared types."""
    p = str(tmp_path / "t.csv")
    _write(
        p,
        [
            "ts,uid",
            "1600000000,a",
            "1600000060,b",
            "xxx,c",  # ts not a long
        ],
    )
    good, dlq = split_dlq(read_csv(spark, p, LOG_SCHEMA))
    assert sorted(r["uid"] for r in good.collect()) == ["a", "b"]
    assert [r["raw"] for r in dlq.collect()] == ["xxx,c"]


def test_jsonl_dlq_streaming_microbatch(spark, tmp_path):
    """The same PERMISSIVE options on readStream: the DLQ contract holds
    on the micro-batch ingest path (good rows flow, corrupt captured)."""
    import uuid

    from kafkastreamsjavachallenge_spark.sources.textual import _with_corrupt

    d = str(tmp_path / "stream")
    _write(
        os.path.join(d, "f0.jsonl"),
        ['{"ts": 1600000000, "uid": "a"}', "broken line"],
    )
    stream = (
        spark.readStream.schema(_with_corrupt(LOG_SCHEMA))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(d)
    )
    name = f"dlq_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(name).collect()
    good = [r for r in rows if r[CORRUPT_COL] is None]
    bad = [r for r in rows if r[CORRUPT_COL] is not None]
    assert [r["uid"] for r in good] == ["a"]
    assert [r[CORRUPT_COL] for r in bad] == ["broken line"]
