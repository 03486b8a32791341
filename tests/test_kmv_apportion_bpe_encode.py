"""KMV bottom-k sketch (operators/kmv.py), largest-remainder apportionment
(operators/apportion.py), and the BPE encode step (operators/bpe.py).

What must hold:
- KMV: below k the sketch IS the set (count exact); merge of per-part
  sketches equals the sketch of the union (closure); the estimator lands
  within its k-governed error band on a set >> k.
- apportion: allocations are integers summing to EXACTLY the budget, each
  within 1 of the real-valued proportional share (Hamilton's guarantee),
  and non-positive weights get nothing.
- bpe_encode: greedy-leftmost merge application byte-equal to a hand
  computation; empty/non-alphabetic docs produce the md5('') segmentation.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from document_extraction_spark.operators import kmv as KMV
from document_extraction_spark.operators.apportion import apportion
from document_extraction_spark.operators.bpe import bpe_encode


@pytest.fixture(scope="module")
def vals(spark):
    # 3 groups with 10 / 200 / 5000 distinct values
    return spark.range(5000).selectExpr(
        "CASE WHEN id < 10 THEN 'a' WHEN id < 210 THEN 'b' ELSE 'c' END AS g",
        "CASE WHEN id < 10 THEN id WHEN id < 210 THEN id - 10 ELSE id END AS v",
    ).union(spark.range(5000).selectExpr("'c' AS g", "id AS v"))  # dups: no-op


def test_kmv_exact_below_k(spark, vals):
    est = KMV.kmv_estimate(
        KMV.kmv_build(vals, "v", ["g"], k=64), ["g"], k=64
    ).orderBy("g").collect()
    by_g = {r["g"]: r for r in est}
    assert by_g["a"]["n_kept"] == 10 and by_g["a"]["est_distinct"] == 10
    assert by_g["b"]["n_kept"] == 64  # saturated
    assert by_g["c"]["n_kept"] == 64


def test_kmv_estimate_band(spark, vals):
    # 5000 distinct in group c, k=64: stderr ~ 1/sqrt(k-2) ~ 13%; allow 4x
    est = KMV.kmv_estimate(
        KMV.kmv_build(vals, "v", ["g"], k=64), ["g"], k=64
    ).where("g = 'c'").collect()[0]
    assert 2400 <= est["est_distinct"] <= 7600


def test_kmv_merge_closure(spark, vals):
    # bottom-k of the union == re-rank of the concatenated per-group sketches
    per_group = KMV.kmv_build(vals, "v", ["g"], k=64)
    merged = KMV.kmv_merge(per_group.withColumn("g", F.lit("ALL")), ["g"], k=64)
    direct = KMV.kmv_build(
        vals.withColumn("g", F.lit("ALL")), "v", ["g"], k=64
    )
    assert sorted(r["h"] for r in merged.collect()) == sorted(
        r["h"] for r in direct.collect()
    )


def test_kmv_intersect_exact_below_k(spark):
    a = KMV.kmv_build(
        spark.range(0, 30).selectExpr("'p' AS g", "id AS v"), "v", ["g"], k=64
    )
    b = KMV.kmv_build(
        spark.range(20, 50).selectExpr("'p' AS g", "id AS v"), "v", ["g"], k=64
    )
    row = KMV.kmv_intersect_estimate(a, b, ["g"], k=64).collect()[0]
    # union 50 < k: everything exact — |A ∩ B| = |{20..29}| = 10
    assert row["est_union"] == 50
    assert row["n_common"] == 10 and row["est_intersect"] == 10


def test_kmv_intersect_band_above_k(spark):
    a = KMV.kmv_build(
        spark.range(0, 4000).selectExpr("'p' AS g", "id AS v"), "v", ["g"], k=64
    )
    b = KMV.kmv_build(
        spark.range(2000, 6000).selectExpr("'p' AS g", "id AS v"), "v", ["g"], k=64
    )
    row = KMV.kmv_intersect_estimate(a, b, ["g"], k=64).collect()[0]
    # true union 6000, true intersection 2000; wide band (theta sampling)
    assert 3000 <= row["est_union"] <= 9000
    assert 600 <= row["est_intersect"] <= 4400


def test_kmv_intersect_disjoint(spark):
    a = KMV.kmv_build(
        spark.range(0, 2000).selectExpr("'p' AS g", "id AS v"), "v", ["g"], k=64
    )
    b = KMV.kmv_build(
        spark.range(100000, 102000).selectExpr("'p' AS g", "id AS v"),
        "v", ["g"], k=64,
    )
    row = KMV.kmv_intersect_estimate(a, b, ["g"], k=64).collect()[0]
    assert row["n_common"] == 0 and row["est_intersect"] == 0


def test_apportion_sums_to_budget_and_bounds(spark):
    df = spark.createDataFrame(
        [("h1", 17), ("h2", 5), ("h3", 78), ("h4", 1), ("h5", 0), ("h6", -3)],
        "host string, w long",
    )
    out = apportion(df, "host", "w", budget=101).collect()
    total_w = 17 + 5 + 78 + 1
    assert sum(r["alloc"] for r in out) == 101
    # w<=0 keys stay in the output with alloc 0 (r5 ADVICE fix)
    assert {r["host"] for r in out} == {"h1", "h2", "h3", "h4", "h5", "h6"}
    for r in out:
        if r["w"] is not None and r["w"] > 0:
            share = 101 * r["w"] / total_w
            assert share - 1 < r["alloc"] < share + 1
        else:
            assert r["alloc"] == 0


def test_apportion_degenerate_single_key(spark):
    df = spark.createDataFrame([("only", 3)], "host string, w long")
    assert apportion(df, "host", "w", budget=42).collect()[0]["alloc"] == 42


def test_bpe_encode_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "aab aab ab"), (2, "zz! 42"), (3, None)],
        "doc_id long, text string",
    )
    # one merge: '<a><b>' -> '<ab>'
    out = {
        r["doc_id"]: r
        for r in bpe_encode(docs, [(1, "<a><b>", 3)]).collect()
    }
    enc = "<a><ab> <a><ab> <ab>"
    assert out[1]["n_words"] == 3
    assert out[1]["n_symbols"] == 5
    assert out[1]["enc_hash"] == hashlib.md5(enc.encode()).hexdigest()
    # doc 2: no token survives the [a-z]+ filter -> empty segmentation
    assert out[2]["n_words"] == 0 and out[2]["n_symbols"] == 0
    assert out[2]["enc_hash"] == hashlib.md5(b"").hexdigest()
    assert 3 not in out  # null text dropped


def test_bpe_encode_greedy_leftmost(spark):
    # 'aaa' with merge '<a><a>' -> '<aa><a>' (leftmost, non-overlapping)
    docs = spark.createDataFrame([(1, "aaa")], "doc_id long, text string")
    row = bpe_encode(docs, [(1, "<a><a>", 1)]).collect()[0]
    assert row["enc_hash"] == hashlib.md5(b"<aa><a>").hexdigest()
    assert row["n_symbols"] == 2


def test_apportion_keeps_nonpositive_weight_keys(spark):
    """r5 ADVICE (low): keys with w <= 0 (or NULL) stay in the output with
    alloc = 0 so joins back to the key table lose nothing."""
    df = spark.createDataFrame(
        [("a", 10), ("b", 0), ("c", -5), ("d", None), ("e", 30)],
        "host string, w int",
    )
    out = {r["host"]: r for r in apportion(df, "host", "w", budget=7).collect()}
    assert set(out) == {"a", "b", "c", "d", "e"}
    assert sum(r["alloc"] for r in out.values()) == 7
    for k in ("b", "c", "d"):
        assert out[k]["alloc"] == 0 and out[k]["base"] == 0 and out[k]["rem"] == 0
