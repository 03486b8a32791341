"""KWIC concordance (operators/concordance.py): window clamping at both
document edges, multiple hits per document, whole-token matching, and the
map-only plan promise."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_extraction_spark.operators.concordance import kwic


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "cat cat dog"),
            (3, "concatenate is not a hit"),
            (4, None),
        ],
        "doc_id long, text string",
    )


def test_window_and_clamping(spark, docs):
    out = {(r["doc_id"], r["hit_pos"]): r["snippet"]
           for r in kwic(docs, "doc_id", "text", "cat", window=2).collect()}
    assert out[(1, 1)] == "the cat sat on"          # clamped left
    assert out[(2, 0)] == "cat cat dog"             # clamped both
    assert out[(2, 1)] == "cat cat dog"
    assert (3, 2) not in out                        # substring != token
    assert all(k[0] != 3 for k in out)


def test_case_insensitive_whole_token(spark):
    df = spark.createDataFrame([(1, "The CAT sat")], "doc_id long, text string")
    rows = kwic(df, "doc_id", "text", "Cat", window=1).collect()
    assert len(rows) == 1 and rows[0]["snippet"] == "the cat sat"


def test_map_only_plan(spark, docs):
    plan = (
        kwic(docs, "doc_id", "text", "cat")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
