"""Snapshot diff / CDC (operators/cdc.py): change classification, delta-only
output, null discrimination, and the apply == rebuild pin."""

from __future__ import annotations

from pyspark.sql import functions as F

from document_extraction_spark.operators import cdc


def _snaps(spark):
    old = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 20.0),
            (3, "c", 30.0),
            (4, None, 40.0),
            (5, "", 50.0),
        ],
        "k int, s string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),      # unchanged
            (2, "B", 20.0),      # update (s)
            (4, "", 40.0),       # update: NULL -> '' must be detected
            (5, "", 50.0),       # unchanged
            (6, "f", 60.0),      # insert
        ],  # 3 deleted
        "k int, s string, v double",
    )
    return old, new


def test_classification_and_delta_only(spark):
    old, new = _snaps(spark)
    diff = cdc.snapshot_diff(old, new, ["k"], ["s", "v"])
    got = {r["k"]: r for r in diff.collect()}
    assert set(got) == {2, 3, 4, 6}  # 1 and 5 unchanged -> no row
    assert got[2]["change_type"] == "update"
    assert got[2]["old_s"] == "b" and got[2]["new_s"] == "B"
    assert got[3]["change_type"] == "delete" and got[3]["new_s"] is None
    assert got[4]["change_type"] == "update"  # null vs '' discriminated
    assert got[6]["change_type"] == "insert" and got[6]["old_s"] is None


def test_apply_changes_equals_new_snapshot(spark):
    old, new = _snaps(spark)
    diff = cdc.snapshot_diff(old, new, ["k"], ["s", "v"])
    rolled = cdc.apply_changes(old, diff, ["k"], ["s", "v"])
    assert sorted(map(tuple, rolled.collect())) == sorted(map(tuple, new.collect()))


def test_empty_diff_on_identical_snapshots(spark):
    old, _ = _snaps(spark)
    assert cdc.snapshot_diff(old, old, ["k"], ["s", "v"]).count() == 0


def test_composite_key(spark):
    a = spark.createDataFrame([(1, 1, "x"), (1, 2, "y")], "k1 int, k2 int, s string")
    b = spark.createDataFrame([(1, 1, "x"), (1, 2, "z")], "k1 int, k2 int, s string")
    diff = cdc.snapshot_diff(a, b, ["k1", "k2"], ["s"])
    rows = diff.collect()
    assert len(rows) == 1 and rows[0]["k2"] == 2 and rows[0]["change_type"] == "update"
