"""Ordered funnel analysis and cohort retention — the two canonical
product-analytics queries over an event stream, engine-exact by
construction (min-timestamps and integer week arithmetic only, no floats).

Funnel: how many users complete step1 -> step2 -> ... IN ORDER, where each
step must occur at or after the user's earliest completion of the previous
step. Computed as a chain of per-step min-ts aggregations, each keyed on
user:

  t1(u) = min ts of step1 events
  t_k(u) = min ts of step-k events with ts >= t_{k-1}(u)

Distributed shape: one groupBy(user) per step over the PRE-FILTERED step
events (the event-type filter pushes into the scan, so each step's shuffle
carries only that step's rows); the chaining joins are per-user one-row
frames. All shuffles share the user key — AQE reuses the exchange.

Cohort retention: users bucketed by first-seen week ("cohort"), activity
counted per (cohort, week-offset). Weeks are floor(days/7) from the epoch
of the cohort week start — integer arithmetic, hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(events: DataFrame, steps: list[str], user_col: str = "user_id",
           type_col: str = "event_type", ts_col: str = "ts") -> DataFrame:
    """(step, step_name, n_users): users whose events complete the step
    prefix in order. n_users is non-increasing by construction."""
    reached = None  # (user, t_prev)
    counts = []
    for i, step in enumerate(steps):
        ev = events.where(F.col(type_col) == step).select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("t")
        )
        if reached is None:
            cur = ev.groupBy("u").agg(F.min("t").alias("t_min"))
        else:
            cur = (
                ev.join(reached, "u")
                .where(F.col("t") >= F.col("t_prev"))
                .groupBy("u")
                .agg(F.min("t").alias("t_min"))
            )
        reached = cur.select("u", F.col("t_min").alias("t_prev"))
        counts.append(
            cur.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i + 1).alias("step"),
                F.lit(step).alias("step_name"),
                "n_users",
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """(cohort_week, week_offset, n_users): distinct users from each
    first-seen-week cohort active in each subsequent week. week_offset 0 is
    the cohort week itself (== cohort size)."""
    day = F.to_date(F.col(ts_col))
    weeks = events.select(
        F.col(user_col).alias("u"),
        F.date_sub(day, F.expr(f"(datediff(to_date({ts_col}), DATE '1970-01-05')) % 7"))
        .alias("week"),
    )
    first = weeks.groupBy("u").agg(F.min("week").alias("cohort_week"))
    active = weeks.distinct()
    return (
        active.join(first, "u")
        .select(
            "u",
            "cohort_week",
            F.expr("datediff(week, cohort_week) div 7").alias("week_offset"),
        )
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("u").alias("n_users"))
    )
