"""Structured Streaming layer: the reference's Kafka Streams topology
re-expressed as readStream → transform → writeStream."""
