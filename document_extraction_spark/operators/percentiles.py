"""Rank-exact percentile summaries — p50/p90/p99-style group summaries
where every reported value IS a row's value, selected by integer rank.

Why not percentile_approx / quantile interpolation: approx sketches are
engine-specific, and interpolated quantiles (quantile_cont) average two
neighbours in double — neither hash-verifies (the outliers.py lesson:
RANK SELECTION is engine-exact, interpolation is not).  Here the p-th
percentile of a group of n rows is the value at ordered rank
``ceil(p * n) = (p_millis * n + 999) DIV 1000`` — pure BIGINT arithmetic,
nearest-rank definition (the one SRE latency dashboards use).

Distributed shape: ONE shuffle on the group key — the rank and the group
count ride the same exchange, the requested percentile list explodes
map-side (rows × |ps| before the equality filter prunes), and no second
pass or driver collect exists.  Values are returned verbatim (no
arithmetic), so any orderable type works.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_percentiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    ps_millis: list[int],
    tiebreak_col: str,
) -> DataFrame:
    """(group..., p_millis, value, n) — one row per requested percentile
    per group, nearest-rank semantics.  ``tiebreak_col`` makes the rank of
    duplicate values deterministic (required for hash-verification; it
    does not change which VALUE a percentile reports, only which row)."""
    if not all(0 < p <= 1000 for p in ps_millis):
        raise ValueError(f"ps_millis must be in (0, 1000], got {ps_millis}")
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(value_col).asc(), F.col(tiebreak_col).asc()
    )
    w_all = Window.partitionBy(*group_cols)
    ps = F.array(*[F.lit(int(p)) for p in ps_millis])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(w_all))
        .select(
            *group_cols,
            F.col(value_col).alias("value"),
            "_rn",
            "_n",
            F.explode(ps).alias("p_millis"),
        )
        .where(F.col("_rn") == F.expr("(p_millis * _n + 999) DIV 1000"))
        .select(
            *group_cols,
            "p_millis",
            "value",
            F.col("_n").cast("long").alias("n"),
        )
    )
