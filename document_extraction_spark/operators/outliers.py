"""Robust group-wise outlier detection via median / MAD (median absolute
deviation) — the data-quality monitor a curation pipeline runs per slice
(per source, per language, per event type): mean/stddev break down exactly
when outliers are present, median/MAD do not (50% breakdown point).

Rank-exact formulation: both the median and the MAD are the LOWER MEDIAN
selected by row_number at rank (n+1) div 2 with a caller-named tie-break
column — actual data elements, no interpolation — so unlike quantile_cont
interpolation (whose a+(b-a)*f floating shape differs across engines) every
intermediate is engine-exact and the full verdict set hash-verifies against
a DuckDB twin.

Distributed shape: two window shuffles and two broadcast-able joins, ALL on
the same group key (AQE reuses the partitioning); per-group state is one
(median, mad) row — at 100 TB with millions of groups this stays a pure
shuffle pipeline, no driver state. A monster group costs one sort of its own
partition (same bound as any per-group window; salt upstream if a single
group exceeds a partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _lower_median(df: DataFrame, key: str, val, seq: str, out: str) -> DataFrame:
    """(key, out): the element of ``val`` at rank (n+1) div 2 within each
    key, ordered by (val, seq) — exact, interpolation-free."""
    w = Window.partitionBy(key).orderBy(F.col("_mval"), F.col(seq))
    wn = Window.partitionBy(key)
    return (
        df.withColumn("_mval", val)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
        .where(F.col("_rn") == F.expr("(_n + 1) div 2"))
        .select(F.col(key), F.col("_mval").alias(out))
    )


def robust_outliers(
    df: DataFrame,
    key: str,
    val: str,
    seq: str,
    n_mads: float = 3.0,
) -> DataFrame:
    """Rows whose |value - group_median| exceeds ``n_mads`` * group MAD:
    (seq, key, val, med, mad) for flagged rows only — delta-sized output.

    Groups whose MAD is 0 (over half the values identical) flag every
    deviating row, the conventional MAD-filter behavior.
    """
    med = _lower_median(df, key, F.col(val), seq, "med")
    # `dev` feeds BOTH the MAD median and the final verdict join; Spark does
    # not CSE across DataFrame branches, so without a lineage cut the scan +
    # median window + join run twice (r7, guide §5 — the dedup.py
    # candidates recipe)
    dev = (
        df.join(med, key)
        .withColumn("adev", F.abs(F.col(val) - F.col("med")))
        .localCheckpoint(eager=False)
    )
    mad = _lower_median(dev, key, F.col("adev"), seq, "mad")
    return (
        dev.join(mad, key)
        .where(F.col("adev") > F.lit(n_mads) * F.col("mad"))
        .select(seq, key, val, "med", "mad")
    )
