"""Mean-shift change-point detection over bucketed count series — the
corpus-monitoring primitive ("when did this source's volume regime
change?") that pairs with operators/drift.py's distribution drift: drift
says WHAT changed between two snapshots, CUSUM says WHEN within one series.

Integer CUSUM formulation (Page 1954, scaled to stay integral): for a
series x_1..x_n with total T, the classic statistic is the running sum of
deviations from the mean, S_t = sum_{i<=t} (x_i - T/n).  Multiplying
through by n gives S'_t = sum_{i<=t} (n*x_i - T) = n*S_t — EXACT BIGINT
arithmetic (counts are integers), same argmax, no float mean anywhere, so
the detected change point and its statistic hash-verify across engines
(the PageRank integer-math rule applied to sequential statistics).  The
most-likely single change point is argmax_t |S'_t| (ties -> earliest
bucket), the standard CUSUM estimator for a one-shift model.

Distributed shape: ONE shuffle on the series key — the per-series count/
total windows and the ordered cumulative window all share the same
partition key, so Catalyst reuses a single exchange; the argmax is one
more row_number over the same partitioning.  Series length is bounded by
the bucketing (days/hours), not corpus size; a series is one partition's
worth of rows, which is exactly how a monitoring query should shard.

Overflow bound: n * max(x) * n_buckets must fit in int64 — at 10^6 buckets
of 10^6 counts that is 10^18, at the edge; coarsen buckets past that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cusum_changepoints(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """One row per series: (group, cp_at, cusum, n_buckets, total).

    ``cusum`` is the signed scaled statistic n*S_t at the detected point —
    negative means the early regime ran BELOW the series mean (an upward
    shift after cp_at), positive the reverse.  Input rows must be one per
    (group, order) bucket (pre-aggregate counts first)."""
    w_all = Window.partitionBy(group_col)
    w_ord = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scaled = (
        df.withColumn("_n", F.count(F.lit(1)).over(w_all))
        .withColumn("_tot", F.sum(value_col).over(w_all))
        .withColumn(
            "_cusum",
            F.sum(
                F.col(value_col).cast("long") * F.col("_n") - F.col("_tot")
            ).over(w_ord),
        )
    )
    w_pick = Window.partitionBy(group_col).orderBy(
        F.abs(F.col("_cusum")).desc(), order_col
    )
    return (
        scaled.withColumn("_rk", F.row_number().over(w_pick))
        .where(F.col("_rk") == 1)
        .select(
            group_col,
            F.col(order_col).alias("cp_at"),
            F.col("_cusum").cast("long").alias("cusum"),
            F.col("_n").cast("long").alias("n_buckets"),
            F.col("_tot").cast("long").alias("total"),
        )
    )
