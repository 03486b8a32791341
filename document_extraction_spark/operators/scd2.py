"""Slowly-changing-dimension type 2 (SCD2) history: turn an append-only
change log into validity-interval rows, and MERGE a change batch into an
existing history table.

The warehouse-standard shape for "what was this entity's attribute AT time
t": each version carries (valid_from, valid_to, is_current); point-in-time
lookups become a range predicate instead of a log scan.

Distributed shape:
- ``scd2_from_log`` is ONE window shuffle on the key: lag() collapses
  consecutive no-change rows map-side of the second pass, lead() closes each
  interval. No self-joins, no driver state.
- ``scd2_apply`` (incremental MERGE) touches only keys present in the batch:
  current rows for batched keys are closed with a broadcast-able semi-join,
  new versions appended — the untouched history never rewrites (at 100 TB
  pair with partitioned/Iceberg MERGE from sources/tableio for file-level
  targeting).

Determinism: ties within a key are broken by a caller-named sequence column,
so intervals are engine-exact and the full history hash-verifies against a
DuckDB window twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_log(log: DataFrame, key: str, attr: str, ts: str,
                  seq: str) -> DataFrame:
    """History table from a change log: one row per (key, attr-run), interval
    [valid_from, valid_to), open (NULL valid_to) for the current version.

    Consecutive rows with an unchanged attribute are collapsed into the run's
    first row, so re-delivered no-op changes don't fragment intervals.
    """
    w = Window.partitionBy(key).orderBy(ts, seq)
    changed = (
        log.withColumn("_prev", F.lag(attr).over(w))
        # first row of each run: attribute differs from predecessor (or none)
        .where(F.col("_prev").isNull() | (F.col("_prev") != F.col(attr)))
        .drop("_prev")
    )
    w2 = Window.partitionBy(key).orderBy(ts, seq)
    return (
        changed.select(
            F.col(key),
            F.col(attr),
            F.col(ts).alias("valid_from"),
            F.lead(ts).over(w2).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def scd2_apply(history: DataFrame, batch: DataFrame, key: str, attr: str,
               ts: str) -> DataFrame:
    """MERGE one change batch (one row per key: the new version) into an
    SCD2 history: close the open interval of every batched key at the batch
    row's ts, append the new open version; no-op when the open version
    already carries the same attribute.  A batch key with NO history rows is
    an INSERT: it becomes a brand-new open version (r5 ADVICE fix — the
    apply == rebuild-from-extended-log invariant must hold for new keys too).

    Only batched keys shuffle; ``history`` rows for other keys pass through
    untouched (Catalyst keeps the untouched branch scan-only).
    """
    b = batch.select(
        F.col(key), F.col(attr).alias("_new_attr"), F.col(ts).alias("_new_ts")
    )
    h = history.join(b, key, "left")
    real_change = F.col("_new_attr").isNotNull() & F.col("is_current") & (
        F.col(attr) != F.col("_new_attr")
    )
    closed = h.select(
        key, attr, "valid_from",
        F.when(real_change, F.col("_new_ts")).otherwise(F.col("valid_to"))
        .alias("valid_to"),
        F.when(real_change, F.lit(False)).otherwise(F.col("is_current"))
        .alias("is_current"),
    )
    fresh = (
        h.where(real_change)
        .select(
            key,
            F.col("_new_attr").alias(attr),
            F.col("_new_ts").alias("valid_from"),
            F.lit(None).cast(closed.schema["valid_to"].dataType).alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    inserts = (
        b.join(history.select(key), key, "left_anti")
        .select(
            key,
            F.col("_new_attr").alias(attr),
            F.col("_new_ts").alias("valid_from"),
            F.lit(None).cast(closed.schema["valid_to"].dataType).alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    return closed.unionByName(fresh).unionByName(inserts)
