"""Kafka-wire-shaped Python DataSource for log frames (Spark 4 custom
data source API) — batch and micro-batch streaming without a broker.

The reference's production source is a Kafka topic of log-frame records
(UniqueUsersApp.java:92, config.properties:1-5): key = stringified unix
seconds, value = ``{"ts": <unix-seconds>, "uid": "..."}`` JSON bytes
(README.md:18-23).  No broker exists in the test container, so this
DataSource serves the SAME wire schema Spark's Kafka connector produces —
(key binary, value binary, topic, partition, offset, timestamp,
timestampType) — from a directory of per-partition JSONL files
(``partition=N.jsonl``, one record per line, offset = line number).
``parse_log_frames`` (sources/kafka.py) consumes either source unchanged,
so the whole S1 → dedup → window → S2 topology is executable end-to-end
with Kafka record semantics: keyed records, per-partition ordering,
monotonically increasing offsets, resumable micro-batches.

Scale/parallelism: one InputPartition per topic partition file — the same
task layout the Kafka connector derives from topic partitions.  The
streaming reader's offsets are per-partition line counts (the Kafka offset
analog); each micro-batch reads only the new slice of each partition.

This is plumbing for parity + tests, not a 100 TB ingest path — at scale
the real Kafka connector (read_log_frames) takes over with the identical
downstream contract.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

KAFKA_WIRE_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)


def _partition_files(path: str) -> list[tuple[int, str]]:
    out = []
    for fn in sorted(os.listdir(path)):
        if fn.startswith("partition=") and fn.endswith(".jsonl"):
            out.append((int(fn[len("partition=") : -len(".jsonl")]), os.path.join(path, fn)))
    return out


def _emit(rec: dict, topic: str, part: int, offset: int):
    key = rec.get("key")
    value = rec.get("value")
    ts = rec.get("timestamp")
    return (
        key.encode() if isinstance(key, str) else key,
        value.encode() if isinstance(value, str) else value,
        topic,
        part,
        offset,
        datetime.fromtimestamp(ts, tz=timezone.utc).replace(tzinfo=None)
        if ts is not None
        else None,
        0,  # CreateTime, like the Kafka connector
    )


class _FilePartition(InputPartition):
    def __init__(self, part: int, path: str, start: int, end: int):
        self.part = part
        self.path = path
        self.start = start  # first offset (line) to serve, inclusive
        self.end = end  # end offset, exclusive; -1 = to EOF


def _read_slice(p: _FilePartition, topic: str):
    with open(p.path) as f:
        for offset, line in enumerate(f):
            if offset < p.start:
                continue
            if p.end >= 0 and offset >= p.end:
                break
            if not line.strip():
                continue
            yield _emit(json.loads(line), topic, p.part, offset)


class LogFrameBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self.topic = options.get("topic", "logframes")

    def partitions(self):
        return [
            _FilePartition(part, path, 0, -1)
            for part, path in _partition_files(self.path)
        ]

    def read(self, partition: _FilePartition):
        yield from _read_slice(partition, self.topic)


class LogFrameStreamReader(DataSourceStreamReader):
    """Micro-batch reader: offsets are per-partition line counts, the
    direct analog of Kafka consumer offsets.  Files may grow between
    batches; already-served lines are never re-read (exactly-once within
    a run, resumable via the engine's offset log)."""

    def __init__(self, options):
        self.path = options["path"]
        self.topic = options.get("topic", "logframes")

    def initialOffset(self):
        return {str(part): 0 for part, _ in _partition_files(self.path)}

    def latestOffset(self):
        out = {}
        for part, path in _partition_files(self.path):
            with open(path) as f:
                out[str(part)] = sum(1 for _ in f)
        return out

    def partitions(self, start, end):
        files = dict(_partition_files(self.path))
        parts = []
        for key, end_off in end.items():
            p = int(key)
            start_off = start.get(key, 0)
            if end_off > start_off:
                parts.append(_FilePartition(p, files[p], start_off, end_off))
        return parts

    def read(self, partition: _FilePartition):
        yield from _read_slice(partition, self.topic)

    def commit(self, end):
        pass  # file-backed; nothing to clean up


class LogFrameDataSource(DataSource):
    """``spark.read.format("logframes").option("path", dir)`` — register
    with ``spark.dataSource.register(LogFrameDataSource)``."""

    @classmethod
    def name(cls):
        return "logframes"

    def schema(self):
        return KAFKA_WIRE_SCHEMA

    def reader(self, schema):
        return LogFrameBatchReader(self.options)

    def streamReader(self, schema):
        return LogFrameStreamReader(self.options)


def write_topic_dir(path: str, records, n_partitions: int = 4) -> str:
    """Test helper: materialize records as a partitioned topic directory.

    ``records`` yields (key: str|None, value: str, timestamp: int-seconds);
    partition = md5(key) % n_partitions when keyed (deterministic by-key
    placement, like Kafka's hash partitioner — Python's builtin ``hash``
    is salted per process and would move keys between runs), round-robin
    otherwise.
    """
    import hashlib

    os.makedirs(path, exist_ok=True)
    files = [open(os.path.join(path, f"partition={p}.jsonl"), "a") for p in range(n_partitions)]
    try:
        for i, (key, value, ts) in enumerate(records):
            p = (
                int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % n_partitions
                if key is not None
                else i % n_partitions
            )
            files[p].write(
                json.dumps({"key": key, "value": value, "timestamp": ts}) + "\n"
            )
    finally:
        for f in files:
            f.close()
    return path
