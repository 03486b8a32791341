from __future__ import annotations

import pandas as pd
import pytest

from document_extraction_spark.core import classify as C

CASES = [
    ("<html><body><p>x</p></body></html>", "html"),
    ("<div class='a'>y</div>", "html"),
    ("plain old text", "plain"),
    ("word@12.5,40.0\nother@60,40", "pdf"),
    ("\n\n  tok@1,2", "pdf"),
    ("email@example.com", "plain"),          # not coordinates
    ("a@1,2 b@3,4", "plain"),                # two tokens on one line
    ("```json\n{}\n```", "plain"),
    ("", "plain"),
    (None, "plain"),
    ("x < y and y > z", "plain"),
    ("<p>para</p>\ntok@1,2", "html"),        # html wins over pdf
    ("neg@-3.5,-7", "pdf"),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_classify_scalar(raw, expected):
    assert C.classify_one(raw) == expected


def test_classify_vectorized_matches_scalar():
    ser = pd.Series([c for c, _ in CASES], dtype="object")
    assert C.classify_series(ser).tolist() == [e for _, e in CASES]
