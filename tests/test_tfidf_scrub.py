from __future__ import annotations

import math

from pyspark.sql import functions as F

from document_extraction_spark.functions.textstats import scrub_pii
from document_extraction_spark.operators.tfidf import tf_idf_top_terms


def test_scrub_pii_patterns(spark):
    cases = {
        "mail me at bob.smith+x@corp.example.co thanks":
            "mail me at <EMAIL> thanks",
        "see https://example.com/a?b=1#c now":
            "see <URL> now",
        "http://x.io": "<URL>",
        "call +33-6-1234-5678 ok": "call <PHONE> ok",
        "digits 123456789 masked": "digits <PHONE> masked",
        "short 12345 stays": "short 12345 stays",          # < 8 digits
        "a@b.c too-short tld kept": "a@b.c too-short tld kept",
        "url wins: https://ex.org/u@v.com end": "url wins: <URL> end",
        "clean text untouched": "clean text untouched",
    }
    df = spark.createDataFrame(list(cases.items()), ["raw", "want"])
    rows = df.select("want", scrub_pii(F.col("raw")).alias("got")).collect()
    for r in rows:
        assert r["got"] == r["want"]


def test_tfidf_scores_and_ranks(spark):
    docs = spark.createDataFrame(
        [
            (0, "apple banana apple"),
            (1, "banana cherry"),
            (2, "cherry cherry cherry durian"),
        ],
        ["doc_id", "text"],
    )
    out = {
        (r["doc_id"], r["term"]): r
        for r in tf_idf_top_terms(docs, k=10).collect()
    }

    def idf(df_count):
        return math.log((3 + 1) / (df_count + 1)) + 1

    # doc 0: apple tf=2 df=1, banana tf=1 df=2
    assert out[(0, "apple")]["score"] == round(2 * idf(1), 4)
    assert out[(0, "banana")]["score"] == round(1 * idf(2), 4)
    assert out[(0, "apple")]["rank"] == 1
    # doc 2: cherry tf=3 df=2 beats durian tf=1 df=1
    assert out[(2, "cherry")]["rank"] == 1
    assert out[(2, "durian")]["rank"] == 2
    assert out[(2, "durian")]["score"] == round(idf(1), 4)


def test_tfidf_k_and_tiebreak(spark):
    docs = spark.createDataFrame([(0, "b a c")], ["doc_id", "text"])
    rows = tf_idf_top_terms(docs, k=2).orderBy("rank").collect()
    # all three terms tie on score -> alphabetical tie-break, k enforced
    assert [r["term"] for r in rows] == ["a", "b"]
