"""Incremental aggregate state (operators/agg_state.py) and transcript
structural QC (operators/transcript_qc.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from document_extraction_spark.operators import agg_state as AS
from document_extraction_spark.operators.transcript_qc import transcript_qc


# ----------------------------------------------------------- agg state

def _orders(spark):
    rows = [(i, "A" if i % 2 else "B", float(10 * i + 1)) for i in range(100)]
    return spark.createDataFrame(rows, "k long, status string, price double")


def test_merge_equals_rebuild(spark):
    df = _orders(spark)
    b1, b2 = df.where("k % 3 != 0"), df.where("k % 3 = 0")
    merged = AS.agg_state_merge(
        AS.agg_state_build(b1, ["status"], "price"),
        AS.agg_state_build(b2, ["status"], "price"),
    )
    direct = AS.agg_state_build(df, ["status"], "price")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_merge_parquet_roundtrip(spark, tmp_path):
    df = _orders(spark)
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    AS.agg_state_build(df.where("k < 50"), ["status"], "price").write.parquet(p1)
    AS.agg_state_build(df.where("k >= 50"), ["status"], "price").write.parquet(p2)
    merged = AS.agg_state_merge(spark.read.parquet(p1), spark.read.parquet(p2))
    direct = AS.agg_state_build(df, ["status"], "price")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_finalize_metrics(spark):
    df = spark.createDataFrame(
        [(1, "A", 1.0), (2, "A", 2.0), (3, "A", 4.0)], "k long, status string, price double"
    )
    out = AS.agg_state_finalize(AS.agg_state_build(df, ["status"], "price")).collect()[0]
    assert out["cnt"] == 3 and out["min_v"] == 1.0 and out["max_v"] == 4.0
    assert out["sum_v"] == 7.0 and abs(out["avg_v"] - 2.3333) < 1e-9


def test_merge_associative_three_way(spark):
    df = _orders(spark)
    parts = [AS.agg_state_build(df.where(f"k % 3 = {i}"), ["status"], "price") for i in range(3)]
    ab_c = AS.agg_state_merge(AS.agg_state_merge(parts[0], parts[1]), parts[2])
    a_bc = AS.agg_state_merge(parts[0], AS.agg_state_merge(parts[1], parts[2]))
    assert sorted(map(tuple, ab_c.collect())) == sorted(map(tuple, a_bc.collect()))


# -------------------------------------------------------- transcript QC

def _turns(spark, rows):
    t0 = dt.datetime(2024, 1, 1)
    data = [
        (c, i, role, text, tool, t0 + dt.timedelta(seconds=s))
        for (c, i, role, text, tool, s) in rows
    ]
    return spark.createDataFrame(
        data, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )


def test_clean_conversation_passes(spark):
    df = _turns(
        spark,
        [
            ("c1", 0, "user", "hi", None, 0),
            ("c1", 1, "assistant", "hello", None, 1),
            ("c1", 2, "tool", "result", "search", 2),
            ("c1", 3, "assistant", "done", None, 3),
        ],
    )
    row = transcript_qc(df).collect()[0]
    assert row["qc_ok"] and row["n_turns"] == 4
    for c in ("gap_turns", "dup_turns", "same_role_runs",
              "untagged_tool_turns", "ts_regressions", "empty_turns"):
        assert row[c] == 0


def test_each_violation_detected(spark):
    df = _turns(
        spark,
        [
            # gap: starts at 1, then jumps to 4
            ("gap", 1, "user", "a", None, 0),
            ("gap", 4, "assistant", "b", None, 1),
            # dup turn_idx
            ("dup", 0, "user", "a", None, 0),
            ("dup", 0, "assistant", "b", None, 1),
            # same-role run (user, user)
            ("rr", 0, "user", "a", None, 0),
            ("rr", 1, "user", "b", None, 1),
            # untagged tool turn
            ("tt", 0, "user", "a", None, 0),
            ("tt", 1, "tool", "r", None, 1),
            # ts regression
            ("tsr", 0, "user", "a", None, 5),
            ("tsr", 1, "assistant", "b", None, 2),
            # empty text
            ("et", 0, "user", "  \n ", None, 0),
        ],
    )
    got = {r["conv_id"]: r for r in transcript_qc(df).collect()}
    assert got["gap"]["gap_turns"] == 2 and not got["gap"]["qc_ok"]  # start!=0 + jump
    assert got["dup"]["dup_turns"] == 1
    assert got["rr"]["same_role_runs"] == 1
    assert got["tt"]["untagged_tool_turns"] == 1
    assert got["tsr"]["ts_regressions"] == 1
    assert got["et"]["empty_turns"] == 1
    # tool->tool alternation exemption: tool runs are not same-role violations
    df2 = _turns(
        spark,
        [("x", 0, "tool", "a", "search", 0), ("x", 1, "tool", "b", "python", 1)],
    )
    assert transcript_qc(df2).collect()[0]["same_role_runs"] == 0


def test_qc_on_synthetic_generator(spark):
    """The synth generator's conversations are contiguous from 0 with
    monotonic ts and tagged tool turns — QC must agree (empty/role checks
    excepted: the generator injects edge conversations on purpose)."""
    import pandas as pd

    from document_extraction_spark.sources.transcripts import generate_transcripts_pdf

    pdf = generate_transcripts_pdf(n_convs=30, seed=11)
    df = spark.createDataFrame(pdf)
    out = transcript_qc(df).toPandas()
    assert int(out["gap_turns"].sum()) == 0
    assert int(out["dup_turns"].sum()) == 0
    assert int(out["ts_regressions"].sum()) == 0
    # untagged tool turns are DELIBERATE dirty data (TOOLS pool includes
    # None) — differential check: QC's total must equal the pandas truth
    expected_untagged = int((pdf["role"].eq("tool") & pdf["tool"].isna()).sum())
    assert int(out["untagged_tool_turns"].sum()) == expected_untagged > 0
    expected_empty = int(
        (pdf["text"].isna() | pdf["text"].astype(str).str.fullmatch(r"\s*")).sum()
    )
    assert int(out["empty_turns"].sum()) == expected_empty
