"""SCD2 history (operators/scd2.py): interval construction from a change
log, no-change collapse, and the MERGE-apply equivalence — applying a batch
incrementally equals rebuilding from the extended log."""

from __future__ import annotations

from datetime import datetime

from document_extraction_spark.operators import scd2 as S2

SCHEMA = "k string, a string, ts timestamp, seq long"


def _ts(s):
    return datetime.fromisoformat(s)


LOG = [
    ("u1", "free", _ts("2024-01-01T00:00:00"), 1),
    ("u1", "free", _ts("2024-01-05T00:00:00"), 2),   # no-op: collapses
    ("u1", "pro", _ts("2024-02-01T00:00:00"), 3),
    ("u1", "free", _ts("2024-03-01T00:00:00"), 4),   # back: NEW interval
    ("u2", "pro", _ts("2024-01-10T00:00:00"), 5),
]


def _rows(df):
    return sorted(
        (r.k, r.a, r.valid_from, r.valid_to, r.is_current) for r in df.collect()
    )


def test_intervals_and_collapse(spark):
    df = spark.createDataFrame(LOG, SCHEMA)
    got = _rows(S2.scd2_from_log(df, "k", "a", "ts", "seq"))
    assert got == sorted([
        ("u1", "free", _ts("2024-01-01T00:00:00"), _ts("2024-02-01T00:00:00"), False),
        ("u1", "pro", _ts("2024-02-01T00:00:00"), _ts("2024-03-01T00:00:00"), False),
        ("u1", "free", _ts("2024-03-01T00:00:00"), None, True),
        ("u2", "pro", _ts("2024-01-10T00:00:00"), None, True),
    ])


def test_exactly_one_current_per_key(spark):
    df = spark.createDataFrame(LOG, SCHEMA)
    hist = S2.scd2_from_log(df, "k", "a", "ts", "seq")
    cur = [r for r in hist.collect() if r.is_current]
    assert sorted(r.k for r in cur) == ["u1", "u2"]
    assert all(r.valid_to is None for r in cur)


def test_apply_equals_rebuild(spark):
    base = spark.createDataFrame(LOG, SCHEMA)
    hist = S2.scd2_from_log(base, "k", "a", "ts", "seq")
    batch_rows = [
        ("u1", "enterprise", _ts("2024-04-01T00:00:00"), 6),  # real change
        ("u2", "pro", _ts("2024-04-01T00:00:00"), 7),          # no-op
    ]
    batch = spark.createDataFrame(batch_rows, SCHEMA)
    applied = S2.scd2_apply(hist, batch, "k", "a", "ts")
    rebuilt = S2.scd2_from_log(
        spark.createDataFrame(LOG + batch_rows, SCHEMA), "k", "a", "ts", "seq"
    )
    assert _rows(applied) == _rows(rebuilt)


def test_apply_untouched_keys_pass_through(spark):
    base = spark.createDataFrame(LOG, SCHEMA)
    hist = S2.scd2_from_log(base, "k", "a", "ts", "seq")
    batch = spark.createDataFrame(
        [("u1", "enterprise", _ts("2024-04-01T00:00:00"), 6)], SCHEMA
    )
    applied = S2.scd2_apply(hist, batch, "k", "a", "ts")
    u2 = [r for r in applied.collect() if r.k == "u2"]
    assert len(u2) == 1 and u2[0].is_current and u2[0].a == "pro"


def test_apply_inserts_brand_new_keys(spark):
    """r5 ADVICE (medium): a batch key with no history rows must become a
    new open version, keeping apply == rebuild for inserts too."""
    base = spark.createDataFrame(LOG, SCHEMA)
    hist = S2.scd2_from_log(base, "k", "a", "ts", "seq")
    batch_rows = [
        ("u3", "free", _ts("2024-04-01T00:00:00"), 6),         # brand-new key
        ("u1", "enterprise", _ts("2024-04-01T00:00:00"), 7),   # real change
    ]
    batch = spark.createDataFrame(batch_rows, SCHEMA)
    applied = S2.scd2_apply(hist, batch, "k", "a", "ts")
    rebuilt = S2.scd2_from_log(
        spark.createDataFrame(LOG + batch_rows, SCHEMA), "k", "a", "ts", "seq"
    )
    assert _rows(applied) == _rows(rebuilt)
    u3 = [r for r in applied.collect() if r.k == "u3"]
    assert len(u3) == 1 and u3[0].is_current and u3[0].valid_to is None
