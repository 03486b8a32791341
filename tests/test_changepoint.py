"""Integer CUSUM change-point detection (operators/changepoint.py).

Hand-checkable series: a level shift from 10 to 20 halfway through an
8-bucket series must place the change point exactly at the last low bucket
(where |S'_t| peaks), with the signed statistic negative (early regime
below the mean)."""

from __future__ import annotations

import pytest

from document_extraction_spark.operators.changepoint import cusum_changepoints


def _series(spark, rows):
    return spark.createDataFrame(rows, "g string, t int, x long")


def test_level_shift_found_at_boundary(spark):
    rows = [("a", t, 10) for t in range(4)] + [("a", t, 20) for t in range(4, 8)]
    out = cusum_changepoints(_series(spark, rows), "g", "t", "x").collect()[0]
    # T=120, n=8: S'_t = cumsum(8x - 120) = -40,-80,-120,-160 then climbs back
    assert out["cp_at"] == 3
    assert out["cusum"] == -160
    assert out["n_buckets"] == 8 and out["total"] == 120


def test_downward_shift_signs_positive(spark):
    rows = [("a", t, 20) for t in range(4)] + [("a", t, 10) for t in range(4, 8)]
    out = cusum_changepoints(_series(spark, rows), "g", "t", "x").collect()[0]
    assert out["cp_at"] == 3 and out["cusum"] == 160


def test_constant_series_ties_to_earliest(spark):
    rows = [("a", t, 7) for t in range(5)]
    out = cusum_changepoints(_series(spark, rows), "g", "t", "x").collect()[0]
    # every S'_t == 0: tie -> earliest bucket
    assert out["cp_at"] == 0 and out["cusum"] == 0


def test_independent_series(spark):
    rows = ([("a", t, 10) for t in range(4)] + [("a", t, 20) for t in range(4, 8)]
            + [("b", t, 5) for t in range(3)])
    got = {r["g"]: r for r in
           cusum_changepoints(_series(spark, rows), "g", "t", "x").collect()}
    assert got["a"]["cp_at"] == 3 and got["b"]["cusum"] == 0
