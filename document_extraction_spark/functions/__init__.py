"""Reusable column-level functions (JVM-side expressions, no Python UDFs)."""
