"""Positional phrase search (operators/search.py phrase_search)."""

from __future__ import annotations

from document_extraction_spark.operators.search import phrase_search


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "quick brown quick brown fox"),
            (3, "brown fox quick"),
            (4, "the quick  brown\tfox"),  # whitespace runs collapse
            (5, "quick quick quick"),
        ],
        "doc_id long, text string",
    )


def test_basic_phrase_and_positions(spark):
    out = {
        (r["doc_id"], r["start_pos"])
        for r in phrase_search(_docs(spark), ["quick", "brown", "fox"]).collect()
    }
    assert out == {(1, 1), (2, 2), (4, 1)}


def test_two_word_phrase_multiple_hits_per_doc(spark):
    out = {
        (r["doc_id"], r["start_pos"])
        for r in phrase_search(_docs(spark), ["quick", "brown"]).collect()
    }
    assert out == {(1, 1), (2, 0), (2, 2), (4, 1)}


def test_repeated_term_phrase(spark):
    out = {
        (r["doc_id"], r["start_pos"])
        for r in phrase_search(_docs(spark), ["quick", "quick"]).collect()
    }
    assert out == {(5, 0), (5, 1)}


def test_case_insensitive_and_no_match(spark):
    docs = _docs(spark)
    assert phrase_search(docs, ["QUICK", "BROWN", "FOX"]).count() == 3
    assert phrase_search(docs, ["fox", "brown"]).count() == 0
