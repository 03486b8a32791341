from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from document_extraction_spark.operators.temporal import asof_join, range_join


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute)


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [
        ("A", _ts(0), 100.0),
        ("A", _ts(10), 110.0),
        ("A", _ts(30), 130.0),
        ("B", _ts(5), 50.0),
    ]
    return spark.createDataFrame(rows, "key string, ts timestamp, px double")


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        ("A", _ts(0), 1),    # equal ts: quote at same instant matches
        ("A", _ts(12), 2),
        ("A", _ts(29), 3),
        ("A", _ts(31), 4),
        ("B", _ts(4), 5),    # before any B quote -> null
        ("C", _ts(9), 6),    # key with no quotes -> null
    ]
    return spark.createDataFrame(rows, "key string, ts timestamp, trade_id int")


def test_asof_backward(spark, trades, quotes):
    out = {
        r["trade_id"]: r["px_right"]
        for r in asof_join(trades, quotes, on="ts", by=["key"]).collect()
    }
    assert out[1] == 100.0   # same-instant quote matches
    assert out[2] == 110.0
    assert out[3] == 110.0
    assert out[4] == 130.0
    assert out[5] is None    # no quote yet
    assert out[6] is None    # key absent from right


def test_asof_forward(spark, trades, quotes):
    out = {
        r["trade_id"]: r["px_right"]
        for r in asof_join(trades, quotes, on="ts", by=["key"], direction="forward").collect()
    }
    assert out[1] == 100.0   # same-instant counts forward too
    assert out[2] == 130.0   # next quote at minute 30
    assert out[4] is None    # nothing after minute 31
    assert out[5] == 50.0


def test_asof_tolerance(spark, trades, quotes):
    out = {
        r["trade_id"]: r["px_right"]
        for r in asof_join(
            trades, quotes, on="ts", by=["key"], tolerance_seconds=5 * 60
        ).collect()
    }
    assert out[1] == 100.0   # 0 min away
    assert out[2] == 110.0   # 2 min away
    assert out[3] is None    # nearest quote 19 min back > 5 min tolerance
    assert out[5] is None


def test_asof_keeps_all_left_rows(spark, trades, quotes):
    assert asof_join(trades, quotes, on="ts", by=["key"]).count() == trades.count()


def test_range_join_containment(spark):
    points = spark.createDataFrame(
        [("u", _ts(i), i) for i in (0, 14, 15, 45, 59)],
        "key string, ts timestamp, pid int",
    )
    intervals = spark.createDataFrame(
        [("u", _ts(10), _ts(45), "w1"), ("u", _ts(50), _ts(55), "w2")],
        "key string, w_start timestamp, w_end timestamp, win string",
    )
    got = {
        (r["pid"], r["win"])
        for r in range_join(
            points, intervals, "ts", "w_start", "w_end", by=["key"], slot_seconds=600
        ).collect()
    }
    # inclusive bounds; points 0 and 59 fall in no interval
    assert got == {(14, "w1"), (15, "w1"), (45, "w1")}


def test_range_join_left_keeps_unmatched(spark):
    points = spark.createDataFrame(
        [("u", _ts(0), 1), ("u", _ts(20), 2)], "key string, ts timestamp, pid int"
    )
    intervals = spark.createDataFrame(
        [("u", _ts(15), _ts(25), "w")], "key string, w_start timestamp, w_end timestamp, win string"
    )
    rows = {
        r["pid"]: r["win"]
        for r in range_join(
            points, intervals, "ts", "w_start", "w_end", by=["key"], how="left"
        ).collect()
    }
    assert rows == {1: None, 2: "w"}


def test_range_join_no_nested_loop(spark):
    """The bucketed plan must be an equi-join (SortMergeJoin / BroadcastHash),
    never BroadcastNestedLoopJoin — that is the whole point of the slotting."""
    points = spark.createDataFrame(
        [("u", _ts(0), 1)], "key string, ts timestamp, pid int"
    )
    intervals = spark.createDataFrame(
        [("u", _ts(0), _ts(30), "w")], "key string, w_start timestamp, w_end timestamp, win string"
    )
    plan = (
        range_join(points, intervals, "ts", "w_start", "w_end", by=["key"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan
