"""Time-series resampling with gap fill: regularize event streams onto a
fixed time grid, emitting zero rows for empty buckets.

Event tables (here: the transcript/event activity feed) are irregular;
training-data telemetry, rate monitoring, and windowed feature extraction
all want a dense per-key time grid. The densify step is the part Spark has
no built-in for — ``sequence() + explode`` builds it in-plan.

Plan shape at 100 TB:

* bucket aggregation: ONE shuffle keyed (key, bucket) with map-side combine
  — the irreducible agg.
* per-key span (min/max): second agg on the same key, tiny output.
* the grid is generated executor-side by ``explode(sequence(lo, hi, step))``
  — grid size is span/step PER KEY, so a key spanning years at 1-minute
  steps explodes to ~500k rows; ``max_buckets`` drops such keys explicitly
  (with the drop observable in the output row count) rather than letting
  one pathological key dominate a task.
* grid LEFT JOIN buckets on (key, bucket): both sides share the same
  partitioning key, and AQE picks broadcast when the grid side is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNIT_SECONDS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}


def _step_seconds(step: str) -> int:
    """``"2 hours"`` -> 7200.  Only fixed-width units are supported: a
    month/year grid is not a constant number of seconds, so epoch-aligned
    binning (the property that keeps multi-unit steps lossless) cannot
    express it — raise rather than silently drop events."""
    parts = step.split()
    if len(parts) != 2:
        raise ValueError(f"step must be '<count> <unit>', got {step!r}")
    count, unit_word = parts
    unit = unit_word.rstrip("s")
    if unit not in _UNIT_SECONDS:
        raise ValueError(
            f"unsupported step unit {unit_word!r}: only "
            f"{sorted(_UNIT_SECONDS)} have a fixed length; month/year grids "
            "need calendar-aware bucketing"
        )
    n = int(count)
    if n < 1:
        raise ValueError(f"step count must be >= 1, got {step!r}")
    return n * _UNIT_SECONDS[unit]


def resample_with_gaps(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    max_buckets: int | None = None,
) -> DataFrame:
    """Dense per-key time grid at ``step`` granularity spanning each key's
    [min, max] event time: (key, bucket, n_events, sum_value), zero-filled
    where the key had no events. ``sum_value`` accumulates in DECIMAL
    (exact, order-independent) and rounds to 2 decimals at the edge.

    Buckets are EPOCH-ALIGNED: bucket(ts) = floor(epoch(ts)/step)*step, so a
    multi-unit step ("2 hours", "15 minutes") bins onto exactly the grid the
    ``sequence()`` explode generates — with date_trunc binning, events whose
    truncated bucket fell between multi-unit grid points were silently
    dropped by the LEFT JOIN.  For single-unit steps epoch alignment equals
    date_trunc in UTC (the session timezone session.py pins), so existing
    oracles are unchanged.

    Keys whose span exceeds ``max_buckets`` grid rows are dropped when the
    cap is set (explicit scale guard — see module docstring)."""
    step_seconds = _step_seconds(step)
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts_col)) / step_seconds) * step_seconds
    )
    binned = (
        df.groupBy(F.col(key_col).alias("key"), bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,4)")).alias("sum_dec"),
        )
    )

    def align(c):
        return F.timestamp_seconds(
            F.floor(F.unix_timestamp(c) / step_seconds) * step_seconds
        )

    spans = df.groupBy(F.col(key_col).alias("key")).agg(
        align(F.min(ts_col)).alias("lo"),
        align(F.max(ts_col)).alias("hi"),
    )
    if max_buckets is not None:
        spans = spans.filter(
            (F.col("hi").cast("long") - F.col("lo").cast("long")) / step_seconds
            < max_buckets
        )
    grid = spans.select(
        "key",
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr(f"INTERVAL {step}"))
        ).alias("bucket"),
    )
    return grid.join(binned, ["key", "bucket"], "left").select(
        "key",
        "bucket",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.round(F.coalesce(F.col("sum_dec"), F.lit(0)).cast("double"), 2).alias(
            "sum_value"
        ),
    )
