"""Spark-level operators: dedup, similarity search, multimodal plumbing."""
