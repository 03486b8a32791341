"""Duplicate-span removal (operators/span_dedup.py) — hand-verified fixture.

Width is 3 here (docs are short); corpus semantics are the point:
* a 3-token window repeated across docs is removed from EVERY occurrence;
* overlapping duplicated windows merge into one maximal span;
* intra-doc repetition (same window twice in one doc) counts as duplicated;
* docs shorter than the width and docs with no duplicated window pass
  through untouched, lowercased/whitespace-joined;
* a doc that is entirely one duplicated span cleans to ''.
"""

from __future__ import annotations

import pytest

from document_extraction_spark.operators.span_dedup import duplicate_spans


@pytest.fixture(scope="module")
def rows(spark):
    docs = [
        # d1/d2 share the exact sentence "the quick brown fox jumps" (5 toks)
        # -> every 3-gram of it is duplicated; union covers all 5 positions.
        (1, "A: the quick brown fox jumps over things"),
        (2, "B: the quick brown fox jumps again today"),
        # d3: intra-doc repetition of "spam spam spam" (windows at 1..4 over
        # 6 identical tokens -> 4 occurrences of the same gram -> all covered)
        (3, "spam spam spam spam spam spam"),
        # d4: unique text, same length — untouched.
        (4, "colorless green ideas sleep furiously tonight ok"),
        # d5: shorter than width — no grams, untouched.
        (5, "tiny doc"),
        # d6: exactly one duplicated span shared with d1/d2, plus unique tail
        (6, "the quick brown fox jumps elsewhere entirely"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = duplicate_spans(df, width=3).orderBy("doc_id").collect()
    return {r["doc_id"]: r for r in out}


def test_cross_doc_span_removed_everywhere(rows):
    # "the quick brown fox jumps" occurs in d1, d2, d6 -> its 3 windows are
    # duplicated; covered positions per doc = the 5 span tokens.
    for d, clean in [
        (1, "a: over things"),
        (2, "b: again today"),
        (6, "elsewhere entirely"),
    ]:
        assert rows[d]["clean_text"] == clean
        assert rows[d]["dup_token_count"] == 5
        assert rows[d]["dup_span_count"] == 1


def test_intra_doc_repetition_fully_covered(rows):
    r = rows[3]
    assert r["dup_token_count"] == 6 and r["dup_span_count"] == 1
    assert r["clean_text"] == ""


def test_untouched_docs(rows):
    assert rows[4]["dup_token_count"] == 0
    assert rows[4]["clean_text"] == "colorless green ideas sleep furiously tonight ok"
    assert rows[5]["dup_token_count"] == 0 and rows[5]["n_tokens"] == 2
    assert rows[5]["clean_text"] == "tiny doc"


def test_counts_consistent(rows):
    for r in rows.values():
        kept = len(r["clean_text"].split()) if r["clean_text"] else 0
        assert kept + r["dup_token_count"] == r["n_tokens"]


def test_disjoint_spans_counted_separately(spark):
    # Two separated duplicated windows in one doc -> dup_span_count == 2.
    docs = [
        (1, "alpha beta gamma xx yy zz delta epsilon zeta"),
        (2, "alpha beta gamma qq ww ee delta epsilon zeta"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in duplicate_spans(df, width=3).collect()}
    for d in (1, 2):
        assert out[d]["dup_span_count"] == 2
        assert out[d]["dup_token_count"] == 6
    assert out[1]["clean_text"] == "xx yy zz"
    assert out[2]["clean_text"] == "qq ww ee"
