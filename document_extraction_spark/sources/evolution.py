"""Schema-evolution-safe parquet reads: a long-lived lake table accretes
batches written under different schema versions (columns added, never
rewritten — rewriting 100 TB to backfill a column is exactly what nobody
does). Readers must present ONE logical schema with principled defaults for
rows that predate each column.

Spark mechanics: ``mergeSchema`` unions the per-file footers (absent
columns read as NULL for old files); ``read_evolved`` then coalesces each
evolved column to its declared default, so downstream operators never see
version-dependent NULLs. Column-ADD only — type changes need a table
format's column mapping (see sources/tableio.py Iceberg notes).

Plan cost: mergeSchema reads every file footer at planning time (at 10^5+
files pair it with a manifest, operators/manifest.py, or a table format);
the per-row coalesce is codegen, free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_evolved(spark: SparkSession, path: str, defaults: dict) -> DataFrame:
    """Read ``path`` with schema merging; every column in ``defaults``
    is guaranteed present and non-NULL (absent/NULL -> the default)."""
    df = spark.read.option("mergeSchema", "true").parquet(path)
    for col, default in defaults.items():
        if col in df.columns:
            df = df.withColumn(col, F.coalesce(F.col(col), F.lit(default)))
        else:
            df = df.withColumn(col, F.lit(default))
    return df
