"""Explicit skew handling for joins on heavy-hitter keys.

AQE's skew-join split (enabled session-wide) handles sort-merge partitions
post-hoc; this operator handles the *planned* case where one join key is
known to dominate (e.g. a conversation with 10^6 turns joined to per-conv
metadata): salt the big side's key into ``factor`` sub-keys and explode the
small side across all salts — turning one hot partition into ``factor``
even ones. Published pattern (salted join); cost: small side replicated
``factor`` times, so use with a broadcast-too-big, skewed-key big table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    factor: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` (skewed on ``key``) with ``small`` on ``key`` using a
    salted key. Output columns = big's columns + small's non-key columns.

    Only ``inner`` and ``left`` (outer on the big side) are salt-safe: the
    small side is replicated across all salts, so any join flavor that emits
    unmatched small rows would emit them ``factor`` times."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' only (got {how!r}): "
            "the replicated small side would duplicate unmatched rows"
        )
    # salt from row POSITION, not row content: content-derived salt maps
    # identical duplicate rows (the classic hot-key shape) to ONE salt value,
    # leaving the hot key unsplit. partition_id + monotonic id is unique per
    # row and deterministic per task layout.
    big_s = big.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
            F.lit(factor),
        ).cast("int"),
    )
    salts = small.sparkSession.range(factor).select(F.col("id").cast("int").alias("_salt"))
    small_s = small.crossJoin(salts)  # replicate small side across all salts
    joined = big_s.join(small_s, [key, "_salt"], how)
    return joined.drop("_salt")
