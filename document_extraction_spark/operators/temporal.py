"""Temporal join operators Spark lacks natively: as-of join and range join.

Both are expressed as compositions of existing DataFrame ops (no Python in
the hot path), per the engine's operator policy: composition first, Pandas
kernels only when semantics force it.

**As-of join** (``asof_join``): for each left row, the single most recent
right row with ``right.ts <= left.ts`` within the same key group — the
standard union + last(ignorenulls) window trick:

    tag left/right -> union on (keys, ts, tag) -> per-key window ordered by
    (ts, tag) carrying last non-null right payload forward -> keep left rows.

One shuffle on the by-keys (the same shuffle a naive join would need), one
window pass, NO join node at all — crucially it never builds the
|left| x |right-per-key| intermediate a time-inequality join would, so a
key with 10^6 rows on both sides stays O(n log n) sort, not O(n^2) pairs.

**Range join** (``range_join``): left points joined to right intervals
containing them. The naive plan is an inequality join — Spark must fall back
to BroadcastNestedLoopJoin (a scan of every interval per point). The scale
path buckets time into fixed-width slots: intervals explode to the slots
they overlap (``sequence``), points map to one slot, the join is a slot
equi-join + exact containment filter. Bucket fan-out = interval_len/width,
bounded by construction; the equi-join shuffles on (slot) or (key, slot) —
AQE handles slot skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent (``backward``) or next
    (``forward``) right row by ``on`` within the ``by`` group; ties on equal
    timestamps match (right row at the same instant counts).

    Output: all left columns + each right non-key column as ``<col><suffix>``
    (NULL when no right row qualifies, or the match is farther than
    ``tolerance_seconds``).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = by or []
    payload = [c for c in right.columns if c != on and c not in by]

    # union schema: keys, ts, side tag, left row id, right payload columns
    l_tag, r_tag = (1, 0) if direction == "backward" else (0, 1)
    lhs = left.select(
        *by,
        F.col(on).alias("_ts"),
        F.lit(l_tag).alias("_side"),
        F.struct(*left.columns).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in payload],
        F.lit(None).cast(right.schema[on].dataType).alias("_r_ts"),
    )
    rhs = right.select(
        *by,
        F.col(on).alias("_ts"),
        F.lit(r_tag).alias("_side"),
        F.lit(None).cast(lhs.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"_r_{c}") for c in payload],
        F.col(on).alias("_r_ts"),
    )
    unioned = lhs.unionByName(rhs)

    if direction == "backward":
        # right rows sort before left rows at equal ts (tag 0 < 1), so a
        # same-instant right row is visible to the left row
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("_ts").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carry = {c: F.last(f"_r_{c}", ignorenulls=True).over(w) for c in payload}
        carry_ts = F.last("_r_ts", ignorenulls=True).over(w)
        is_left = F.col("_side") == 1
        dist = F.unix_timestamp("_ts") - F.unix_timestamp(carry_ts)
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("_ts").asc(), F.col("_side").asc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        carry = {c: F.first(f"_r_{c}", ignorenulls=True).over(w) for c in payload}
        carry_ts = F.first("_r_ts", ignorenulls=True).over(w)
        is_left = F.col("_side") == 0
        dist = F.unix_timestamp(carry_ts) - F.unix_timestamp("_ts")

    within = F.lit(True) if tolerance_seconds is None else (
        carry_ts.isNotNull() & (dist <= F.lit(tolerance_seconds))
    )
    out = unioned.select(
        "_lrow",
        "_side",
        *[
            F.when(within, carry[c]).otherwise(F.lit(None)).alias(f"{c}{suffix}")
            for c in payload
        ],
    ).filter(is_left)
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[f"{c}{suffix}" for c in payload],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: list[str] | None = None,
    slot_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to interval rows with
    ``start <= point <= end`` (+ optional key equality), via time-slot
    bucketing so the physical plan is an equi-join, not a nested loop.

    ``slot_seconds`` trades bucket fan-out (intervals replicate once per
    overlapped slot) against join selectivity (points per slot); pick it
    near the median interval length. ``how='inner'`` or ``'left'`` (left
    keeps unmatched points with NULL interval columns).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports inner|left, got {how!r}")
    by = by or []
    # floor (not truncate-toward-zero): keeps slot monotone across the epoch
    p_slot = F.floor(F.unix_timestamp(F.col(point_col)) / slot_seconds)
    i_slots = F.sequence(
        F.floor(F.unix_timestamp(F.col(start_col)) / slot_seconds),
        F.floor(F.unix_timestamp(F.col(end_col)) / slot_seconds),
    )
    p = points.withColumn("_slot", p_slot)
    i = intervals.withColumn("_slot", F.explode(i_slots))
    cond = [p["_slot"] == i["_slot"]] + [p[k] == i[k] for k in by]
    contain = (p[point_col] >= i[start_col]) & (p[point_col] <= i[end_col])
    if how == "inner":
        joined = p.join(i, cond).filter(contain)
    else:
        joined = p.join(i, cond + [contain], "left")
    keep_i = [c for c in intervals.columns if c not in by]
    return joined.select(
        *[p[c] for c in points.columns],
        *[i[c] for c in keep_i],
    )
