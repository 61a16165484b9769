"""spamscope_spark — a PySpark-native streaming/CEP analytics engine.

A from-scratch Structured Streaming reimplementation of the capabilities of
the SpamScope Storm topology (reference: /root/reference), recast as a CEP
pipeline over multi-turn conversation/agent transcripts
(conv_id, turn_idx, role, text, tool, ts).

Design principles (Spark-first, NOT a port):
- DataFrame/SQL declarative plans everywhere; Catalyst picks physical ops.
- Built-in JVM functions in hot paths; Arrow-vectorized pandas_udfs only
  where built-ins genuinely cannot express the semantics (fuzzy hashing).
- Explicit partitioning/skew handling (salted two-stage aggregation).
- Watermarked stateful streaming with exactly-once idempotent sinks.
"""

__version__ = "0.1.0"
