"""Structured Streaming layer: file/kafka-source ingest → streaming
dedup → validated upsert sink + progress monitoring."""
