"""File-level min/max manifest pruning — Iceberg/Delta data skipping without
the table format: build a (file, row_count, per-column min/max) manifest in
one scan, then plan reads that OPEN only the files a range predicate can
touch. Complements operators/layout.py (z-order makes files tight in the
clustered dims; the manifest is what turns tight files into skipped files
when no table format carries the stats).

At 100 TB the manifest is one row per file (~10^5 rows for 1 GB files) — a
driver-side file-list materialization is the same bounded planning step
every table format performs; the DATA never leaves executors.

Correctness invariant (pinned in tests + the q_manifest_prune oracle): a
pruned read followed by the predicate is row-identical to the full-scan
filter — pruning can only skip files the predicate provably cannot match
(min/max are conservative bounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_manifest(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """(file, row_count, min_<c>, max_<c> per c in cols) — ONE scan of the
    dataset, map-side combinable agg keyed by input_file_name()."""
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("row_count")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy(F.input_file_name().alias("file")).agg(*aggs)


def pruned_files(manifest: DataFrame, col: str, lo, hi) -> list[str]:
    """Files whose [min, max] interval intersects [lo, hi] — the candidate
    set for ``col BETWEEN lo AND hi``. Bounded driver materialization (one
    row per file), exactly like a table-format planner."""
    keep = manifest.where(
        ~((F.col(f"max_{col}") < F.lit(lo)) | (F.col(f"min_{col}") > F.lit(hi)))
    )
    return [r["file"] for r in keep.select("file").collect()]


def pruned_read(spark: SparkSession, path: str, manifest: DataFrame,
                col: str, lo, hi) -> DataFrame:
    """Read only the files that can satisfy ``col BETWEEN lo AND hi``, then
    apply the exact predicate (min/max skipping is conservative — residual
    rows outside the range inside surviving files are filtered here)."""
    files = pruned_files(manifest, col, lo, hi)
    base = spark.read.parquet(*files) if files else spark.read.parquet(path).limit(0)
    return base.where(F.col(col).between(F.lit(lo), F.lit(hi)))
