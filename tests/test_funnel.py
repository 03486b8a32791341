"""Funnel analysis + cohort retention (operators/funnel.py)."""

from __future__ import annotations

import datetime as dt

from document_extraction_spark.operators.funnel import cohort_retention, funnel


def _ev(spark, rows):
    t0 = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(u, t, t0 + dt.timedelta(days=d)) for (u, t, d) in rows],
        "user_id long, event_type string, ts timestamp",
    )


def test_funnel_order_matters(spark):
    df = _ev(
        spark,
        [
            (1, "view", 0), (1, "click", 1), (1, "purchase", 2),  # completes
            (2, "view", 0), (2, "click", 1),                      # stops at 2
            (3, "click", 0), (3, "view", 1), (3, "purchase", 2),  # click BEFORE view
            (4, "purchase", 0),                                   # no view
        ],
    )
    out = {r["step_name"]: r["n_users"] for r in
           funnel(df, ["view", "click", "purchase"]).collect()}
    # user 3's click precedes their first view -> not counted at step 2,
    # but their purchase after the (missing) click chain can't count either
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_same_timestamp_counts(spark):
    df = _ev(spark, [(1, "view", 0), (1, "click", 0)])  # ts equal: >= admits
    out = {r["step_name"]: r["n_users"] for r in funnel(df, ["view", "click"]).collect()}
    assert out == {"view": 1, "click": 1}


def test_funnel_monotone_on_events_table(spark, testdata_dir):
    import os

    path = os.path.join(testdata_dir, "sf0.001", "events.parquet")
    df = spark.read.parquet(path)
    rows = funnel(df, ["view", "click", "purchase"]).orderBy("step").collect()
    ns = [r["n_users"] for r in rows]
    assert ns == sorted(ns, reverse=True) and ns[0] > 0


def test_cohort_retention_shape(spark):
    df = _ev(
        spark,
        [
            (1, "view", 0),   # cohort week 0 (2024-01-01 is a Monday)
            (1, "view", 8),   # active week 1
            (2, "view", 1),   # same cohort week 0
            (3, "view", 7),   # cohort week 1
        ],
    )
    out = {(str(r["cohort_week"]), r["week_offset"]): r["n_users"]
           for r in cohort_retention(df).collect()}
    assert out[("2024-01-01", 0)] == 2
    assert out[("2024-01-01", 1)] == 1
    assert out[("2024-01-08", 0)] == 1
    # offset-0 row exists for every cohort and equals the cohort size
    assert all(off >= 0 for (_, off) in out)
