"""Char-trigram LM scoring (operators/lm_score.py): model counts, smoothing
math, and the quality ordering the score exists to produce."""

from __future__ import annotations

import math

from document_extraction_spark.operators import lm_score as LM


def test_model_counts_tiny_corpus(spark):
    # one doc "abcabc": trigrams abc, bca, cab, abc
    docs = spark.createDataFrame([(1, "abcabc")], "doc_id long, text string")
    c3, c2 = LM.trigram_model(docs)
    assert dict(c3.collect()) == {"abc": 2, "bca": 1, "cab": 1}
    assert dict(c2.collect()) == {"ab": 2, "bc": 1, "ca": 1}


def test_score_matches_hand_computation(spark):
    docs = spark.createDataFrame([(1, "abcabc")], "doc_id long, text string")
    row = LM.lm_score(docs).collect()[0]
    assert row["n_tg"] == 4
    # p(abc)=(2+1)/(2+27); p(bca)=(1+1)/(1+27); p(cab)=(1+1)/(1+27)
    p_abc, p_other = 3 / 29, 2 / 28
    exp_micro = 2 * (1000000 * 3 // 29) + 2 * (1000000 * 2 // 28)
    assert row["sum_p_micro"] == exp_micro
    bits = -(2 * round(math.log2(p_abc), 5) + 2 * round(math.log2(p_other), 5)) / 4
    assert abs(row["avg_bits"] - round(bits, 4)) < 1e-9


def test_normalization_strips_non_alpha(spark):
    docs = spark.createDataFrame(
        [(1, "AB!c  12 ab c"), (2, "ab c ab c")], "doc_id long, text string"
    )
    # doc 1 normalizes to "ab c ab c" == doc 2 -> identical scores
    out = {r["doc_id"]: r for r in LM.lm_score(docs).collect()}
    assert out[1]["sum_p_micro"] == out[2]["sum_p_micro"]
    assert out[1]["avg_bits"] == out[2]["avg_bits"]


def test_gibberish_scores_worse_than_natural(spark):
    natural = "the table joins the other table and the query is fast " * 8
    gibberish = "qzx jvk wqp zzq xkj vvw qqz jxx kpw zqv " * 8
    docs = spark.createDataFrame(
        [(i, natural) for i in range(1, 9)] + [(9, gibberish)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["avg_bits"] for r in LM.lm_score(docs).collect()}
    # the lone gibberish doc is the high-surprisal outlier
    assert out[9] > max(out[i] for i in range(1, 9))


def test_short_and_null_docs_dropped(spark):
    docs = spark.createDataFrame(
        [(1, "ab"), (2, None), (3, "   "), (4, "abcd")], "doc_id long, text string"
    )
    ids = {r["doc_id"] for r in LM.lm_score(docs).collect()}
    assert ids == {4}
