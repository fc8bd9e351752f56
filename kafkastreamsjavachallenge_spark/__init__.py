"""PySpark-native analytics engine with the capabilities of
frferrari/KafkaStreamsJavaChallenge, re-expressed Spark-first.

The reference (read-only at /root/reference/) is a Kafka Streams app that
counts unique users per 1-minute tumbling event-time window
(UniqueUsersApp.java:91-134).  This engine expresses the same semantics —
plus the relational / LLM-data-pipeline surface declared in SURVEY.md §2 —
as Catalyst logical plans (DataFrame / Spark SQL / Structured Streaming),
designed for 100 TB scale: broadcast joins for dims, partial aggregation,
watermark-bounded state, AQE-driven skew handling.
"""

__version__ = "0.1.0"

from kafkastreamsjavachallenge_spark.session import EngineConfig, build_session, configure_runtime
from kafkastreamsjavachallenge_spark.catalog import load_tables, TABLE_NAMES

__all__ = [
    "EngineConfig",
    "build_session",
    "configure_runtime",
    "load_tables",
    "TABLE_NAMES",
]
