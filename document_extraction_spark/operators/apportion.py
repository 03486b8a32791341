"""Largest-remainder (Hamilton) integer apportionment — split a global
integer budget across keys proportionally to a weight, with the allocations
summing to EXACTLY the budget.

This is the crawl/sampling-budget primitive of a web pipeline: "crawl
B pages this cycle, spread across hosts by token volume", "draw B training
documents across sources by quality mass".  Float shares never sum to B;
Hamilton's method does, deterministically:

    base_i = floor(B * w_i / W)            (W = sum of weights)
    rem_i  = (B * w_i) mod W
    the L = B - sum(base_i) keys with the largest remainders get +1
    (ties broken by key ascending — engine-exact)

All arithmetic is BIGINT (``DIV`` / ``%``), so every allocation
hash-verifies against the DuckDB twin (the PageRank integer-math rule:
Spark ``/`` on longs promotes to DOUBLE, integral math must use DIV).
Overflow bound: B * w_i must fit in int64 — fine for budgets <= 1e9
against token volumes <= 9e9; rescale weights first beyond that.

Distributed shape: two scalar aggregates broadcast back (W, then the
leftover L) and ONE global row_number window ordered by (rem desc, key).
The global window is the scale ceiling — at hundreds of millions of keys,
switch to the two-pass threshold pattern used by
operators/sampling.py:weighted_sample_n (approx the L-th remainder via
percentile_approx, filter, exact top-up of the boundary); at web-host
cardinality (tens of millions) a single-partition window over 16-byte rows
is still a sub-second driver-adjacent step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apportion(df: DataFrame, key_col: str, weight_col: str,
              budget: int) -> DataFrame:
    """(key, w, base, rem, alloc) with sum(alloc) == budget exactly.

    Rows with non-positive (or NULL) weight appear in the output with
    base = rem = alloc = 0 — they carry no proportional claim and never
    receive a remainder seat, but callers joining allocations back to the
    key table get FULL key coverage (r5 ADVICE fix)."""
    all_rows = df.select(
        F.col(key_col).alias("k"),
        F.col(weight_col).cast("long").alias("w"),
    )
    rows = all_rows.where(F.col("w") > 0)
    # note: Spark resolution is case-insensitive — the scalar names must not
    # collide with "w" even by case
    tot = rows.agg(F.sum("w").alias("tot_w"))
    based = (
        rows.crossJoin(F.broadcast(tot))
        .withColumn("base", F.expr(f"({budget} * w) DIV tot_w"))
        .withColumn("rem", F.expr(f"({budget} * w) % tot_w"))
    )
    # the leftover L = budget - sum(base) rides the SAME single-partition
    # exchange the remainder-rank window already pays — a separate
    # aggregate would re-evaluate (re-scan) the whole `based` subtree as a
    # second broadcast branch (plan-shape pinned in test_plan_shapes_r5b)
    w_rk = Window.orderBy(F.col("rem").desc(), F.col("k"))
    w_all = w_rk.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    seated = (
        based.withColumn("rk", F.row_number().over(w_rk))
        .withColumn("_base_sum", F.sum("base").over(w_all))
        .select(
            F.col("k").alias(key_col),
            "w",
            "base",
            "rem",
            (F.col("base")
             + F.when(F.col("rk") <= F.lit(budget) - F.col("_base_sum"), 1)
             .otherwise(0))
            .cast("long").alias("alloc"),
        )
    )
    # NULL-safe complement of (w > 0): ~(NULL > 0) is NULL and would drop
    zeros = all_rows.where(
        F.col("w").isNull() | (F.col("w") <= 0)
    ).select(
        F.col("k").alias(key_col),
        "w",
        F.lit(0).cast("long").alias("base"),
        F.lit(0).cast("long").alias("rem"),
        F.lit(0).cast("long").alias("alloc"),
    )
    return seated.unionByName(zeros)
