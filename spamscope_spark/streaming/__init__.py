"""Structured Streaming layer: watermarked stateful pipeline, keyed
dedup state, exactly-once idempotent sink, metrics."""
