"""Rank-exact percentile summaries (operators/percentiles.py) against
hand-computed nearest-rank values."""

from __future__ import annotations

import pytest

from document_extraction_spark.operators.percentiles import rank_percentiles


@pytest.fixture(scope="module")
def series(spark):
    # group 'a': values 1..10 -> p50 = rank ceil(5.0) = 5, p90 = rank 9,
    # p99 = rank ceil(9.9) = 10; group 'b': single row -> every p = it
    rows = [("a", i, float(i)) for i in range(1, 11)] + [("b", 99, 42.0)]
    return spark.createDataFrame(rows, "g string, id long, v double")


def test_nearest_rank_hand_values(spark, series):
    got = {(r["g"], r["p_millis"]): r["value"] for r in
           rank_percentiles(series, ["g"], "v", [500, 900, 990], "id").collect()}
    assert got[("a", 500)] == 5.0
    assert got[("a", 900)] == 9.0
    assert got[("a", 990)] == 10.0
    assert got[("b", 500)] == got[("b", 990)] == 42.0


def test_duplicate_values_deterministic(spark):
    rows = [("a", i, 7.0) for i in range(5)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = rank_percentiles(df, ["g"], "v", [500], "id").collect()
    assert len(out) == 1 and out[0]["value"] == 7.0 and out[0]["n"] == 5


def test_p1000_is_max(spark, series):
    got = {r["g"]: r["value"] for r in
           rank_percentiles(series, ["g"], "v", [1000], "id").collect()}
    assert got["a"] == 10.0 and got["b"] == 42.0


def test_rejects_out_of_range(spark, series):
    with pytest.raises(ValueError):
        rank_percentiles(series, ["g"], "v", [0], "id")
    with pytest.raises(ValueError):
        rank_percentiles(series, ["g"], "v", [1001], "id")
