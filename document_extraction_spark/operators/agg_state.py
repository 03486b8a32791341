"""Incremental aggregation state: decomposable per-key aggregate state
(count / exact-decimal sum / min / max) persisted as a table, merged across
runs — finalized metrics (including avg) derive from state alone, never from
a history re-scan.

The general form of the sketch-state pattern (operators/sketch_state.py HLL,
operators/cms.py CMS): every algebraic aggregate decomposes into a bounded
per-key state with an associative merge, so a 100 TB rolling pipeline pays
one groupBy per NEW batch (the shuffle that batch's ingest already owes) and
"metrics so far" is a re-agg of a runs x keys state table that grows with
runs, not with data.

Determinism: sums run in DECIMAL (exact, order-independent); count/min/max
are trivially engine-exact; avg is derived at finalize time from exact state
(round at the edge). The merge is pinned equal to a from-scratch rebuild in
both pytest and the q_agg_state oracle — the incremental path can never
drift.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_state_build(df: DataFrame, keys: Sequence[str], val: str,
                    scale: int = 4) -> DataFrame:
    """Per-key state for one batch: (keys..., cnt, sum_v, min_v, max_v).
    ONE map-side-combinable groupBy — the batch's own aggregation shuffle."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(val).cast(f"decimal(28,{scale})")).alias("sum_v"),
        F.min(val).alias("min_v"),
        F.max(val).alias("max_v"),
    )


def agg_state_merge(*states: DataFrame) -> DataFrame:
    """Associative cell-wise merge of state tables (union + re-agg) —
    the same linear-merge shape as CMS/HLL, so states from different runs,
    partitions, or clusters combine in any order."""
    keys = [c for c in states[0].columns if c not in ("cnt", "sum_v", "min_v", "max_v")]
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy(*keys).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def agg_state_finalize(state: DataFrame) -> DataFrame:
    """Final metrics from state alone: keys..., cnt, sum/min/max rounded to
    double at the edge, avg derived from the exact decimal sum."""
    keys = [c for c in state.columns if c not in ("cnt", "sum_v", "min_v", "max_v")]
    return state.select(
        *keys,
        "cnt",
        (F.round(F.col("sum_v"), 2).cast("double") + F.lit(0.0)).alias("sum_v"),
        "min_v",
        "max_v",
        (
            F.round(F.col("sum_v").cast("double") / F.col("cnt").cast("double"), 4)
            + F.lit(0.0)
        ).alias("avg_v"),
    )
