"""Logical plans: the extraction pipeline, checkpoint/resume, metrics."""
