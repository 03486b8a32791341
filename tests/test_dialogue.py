"""Topic segmentation and sequence fingerprinting (operators/dialogue.py).

Hand-checkable streams: units with fully shared vocabulary never split;
a vocabulary swap splits; blank units split (no cohesion); sequence
fingerprints collide iff the full normalized unit sequence matches in
order."""

from __future__ import annotations

import pytest

from document_extraction_spark.operators.dialogue import (
    sequence_dup_groups, sequence_fingerprint, topic_boundaries,
)


def _stream(spark, rows):
    return spark.createDataFrame(rows, "k string, o int, text string")


def test_cohesive_stream_is_one_segment(spark):
    rows = [("a", i, "alpha beta gamma") for i in range(4)]
    out = topic_boundaries(_stream(spark, rows), "k", "o", "text").collect()
    assert all(r["segment_id"] == 0 for r in out)
    assert not any(r["is_boundary"] for r in out)


def test_vocab_swap_splits(spark):
    rows = [("a", 0, "alpha beta gamma"), ("a", 1, "alpha beta delta"),
            ("a", 2, "xray yankee zulu"), ("a", 3, "xray yankee quebec")]
    out = {r["o"]: r for r in
           topic_boundaries(_stream(spark, rows), "k", "o", "text").collect()}
    # 0->1 share 2/4 = 0.5 jaccard (no boundary at t=0.1); 1->2 share 0
    assert not out[1]["is_boundary"] and out[2]["is_boundary"]
    assert [out[i]["segment_id"] for i in range(4)] == [0, 0, 1, 1]


def test_blank_unit_always_splits(spark):
    rows = [("a", 0, "alpha beta"), ("a", 1, "   "), ("a", 2, "alpha beta")]
    out = {r["o"]: r for r in
           topic_boundaries(_stream(spark, rows), "k", "o", "text").collect()}
    assert out[1]["is_boundary"] and out[2]["is_boundary"]


def test_sequence_fingerprint_whitespace_invariant(spark):
    a = [("c1", 0, "Hello  world"), ("c1", 1, "How are you")]
    b = [("c2", 0, " hello world "), ("c2", 1, "how  are you")]
    c = [("c3", 0, "hello world"), ("c3", 1, "DIFFERENT text")]
    fps = {r["k"]: r["seq_fp"] for r in
           sequence_fingerprint(_stream(spark, a + b + c), "k", "o", "text").collect()}
    assert fps["c1"] == fps["c2"] != fps["c3"]


def test_sequence_order_matters(spark):
    a = [("c1", 0, "first"), ("c1", 1, "second")]
    b = [("c2", 0, "second"), ("c2", 1, "first")]
    fps = {r["k"]: r["seq_fp"] for r in
           sequence_fingerprint(_stream(spark, a + b), "k", "o", "text").collect()}
    assert fps["c1"] != fps["c2"]


def test_dup_groups_keeper(spark):
    rows = ([("c1", 0, "x"), ("c1", 1, "y"),
             ("c2", 0, "x"), ("c2", 1, "y"),
             ("c3", 0, "z")])
    groups = sequence_dup_groups(_stream(spark, rows), "k", "o", "text").collect()
    assert len(groups) == 1
    assert groups[0]["n_keys"] == 2 and groups[0]["keeper"] == "c1"
