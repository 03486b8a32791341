"""Snapshot diff / change-data-capture: compute the exact (insert, update,
delete) change set between two snapshots of a keyed table, and re-apply a
change set to roll a snapshot forward.

This is the lakehouse CDF ("change data feed") primitive, derived from data
alone — no table-format support required: given yesterday's and today's
snapshot of a 100 TB dimension, emit only the rows that changed, so every
downstream consumer processes |delta| rows instead of |table|.

Distributed shape:
- each side hashes its compare-columns MAP-SIDE (one md5 over a
  concat_ws) so the full-outer join shuffles (key, hash, carried cols) —
  never the full payload width when callers trim ``carry``;
- ONE shuffle total (the full-outer join on the key); at 100 TB both
  snapshots should be written bucketed/partitioned by the key so the join
  is co-located (see sources/bucketed.py) and per-partition diffs stream;
- the output is |changes| rows — unchanged rows are dropped inside the
  joined projection, before anything else sees them;
- ``apply_changes`` touches only changed keys (left_anti + union), so
  rolling a snapshot forward is O(delta) compute over a scan of the base.

Determinism: change classification compares the two md5 hashes (engine-exact
strings); no floats are involved, so the diff hash-verifies against a DuckDB
twin that classifies by direct column comparison (the two formulations are
equivalent because md5 is injective on the separator-framed encoding:
``\\x1f``-joined fields with a ``\\x00`` null sentinel, the same framing used
across the dedup stack).

Reference parity: the reference CLI re-runs whole documents when anything
changes (main.py loops over every input file unconditionally); snapshot_diff
is the engine's scale-path equivalent — find WHAT changed first, recompute
only that.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"
_NULL = "\x00"


def _row_hash(cols: Sequence[str]):
    """md5 over separator-framed, null-sentineled compare columns —
    map-side, engine-exact."""
    return F.md5(
        F.concat_ws(
            _SEP, *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols]
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    cols: Sequence[str],
) -> DataFrame:
    """Change set between two snapshots keyed by ``keys``, comparing
    ``cols``: one row per changed key with ``change_type`` in
    ('insert', 'update', 'delete'), the old values as ``old_<col>`` and the
    new values as ``new_<col>`` (NULL on the absent side).

    Unchanged keys produce NO row — the output is delta-sized.
    """
    keys = list(keys)
    cols = list(cols)
    o = old.select(
        *keys,
        *[F.col(c).alias(f"old_{c}") for c in cols],
        _row_hash(cols).alias("_old_h"),
    )
    n = new.select(
        *keys,
        *[F.col(c).alias(f"new_{c}") for c in cols],
        _row_hash(cols).alias("_new_h"),
    )
    j = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("_old_h").isNull(), F.lit("insert"))
        .when(F.col("_new_h").isNull(), F.lit("delete"))
        .when(F.col("_old_h") != F.col("_new_h"), F.lit("update"))
    )
    return (
        j.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(
            *keys,
            "change_type",
            *[f"old_{c}" for c in cols],
            *[f"new_{c}" for c in cols],
        )
    )


def apply_changes(
    old: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    cols: Sequence[str],
) -> DataFrame:
    """Roll ``old`` forward by a ``snapshot_diff`` change set: delete the
    deleted keys, replace the updated keys, add the inserted keys.

    Only changed keys join (left_anti on the — typically small, broadcastable
    — change-key set); the surviving base rows pass through untouched, so the
    plan is one scan of ``old`` plus delta-sized work. Pinned in
    tests/test_cdc.py: ``apply_changes(old, snapshot_diff(old, new)) ==
    new`` exactly, so the incremental path can never drift from a rebuild.
    """
    keys = list(keys)
    cols = list(cols)
    touched = changes.select(*keys)
    kept = old.select(*keys, *cols).join(touched, keys, "left_anti")
    fresh = (
        changes.where(F.col("change_type") != "delete")
        .select(*keys, *[F.col(f"new_{c}").alias(c) for c in cols])
    )
    return kept.unionByName(fresh)
