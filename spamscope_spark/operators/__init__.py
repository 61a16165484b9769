"""Composite operators: enrichment, dedup, similarity, sessionization,
temporal joins, skew handling, multimodal plumbing."""
