"""Per-group quantile calibration of quality scores — the prerequisite for
mixing corpora whose quality scorers live on incomparable scales (a web
crawl scored by a fastText classifier vs books scored by perplexity: "0.8"
means different things).  Mapping each score to its within-group
percent_rank puts every source on the same [0, 1] uniform scale, so one
global threshold ("keep the top 30% of each source") means the same thing
everywhere — this is how mixture recipes are actually specified.

percent_rank is (rank - 1) / (n - 1) with ties sharing the min rank:
integer rank arithmetic and ONE double division, identical on both engines
(rounded once at the edge) — rank-exact where z-score calibration (mean/std
floats) would not hash-verify.  Singleton groups calibrate to 0.0
(percent_rank's n=1 convention on both engines).

Distributed shape: ONE window shuffle on the group key.  Group sizes are
corpus-source counts — coarse but bounded skew; at 100 TB a hot source is
salted by pre-bucketing scores (percentiles within hash-salt buckets merge
to within-1/buckets accuracy) — noted, not needed at source cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantile_normalize(
    df: DataFrame,
    score_col: str,
    group_col: str,
    id_col: str,
    out_col: str = "calibrated",
    precision: int = 6,
) -> DataFrame:
    """Adds ``out_col`` = round(percent_rank of score within group, p).

    Ties share a rank (two equal scores calibrate equally — required, or
    the calibrated value would depend on an arbitrary row order); the
    id_col is NOT part of the ordering for exactly that reason, it only
    names the output rows."""
    w = Window.partitionBy(group_col).orderBy(score_col)
    return df.select(
        id_col,
        group_col,
        score_col,
        F.round(F.percent_rank().over(w), precision).alias(out_col),
    )
