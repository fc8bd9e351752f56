"""Sources & sinks: Kafka (S1/S2), files (parquet/json), memory/console."""
