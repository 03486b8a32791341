"""Structured Streaming surfaces: streaming extraction, watermarked windowed
metrics, stateful conversation sessionization."""
