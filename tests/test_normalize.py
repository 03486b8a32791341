"""Unit tests for span normalization — incl. the reference's exact fence-strip
slice semantics (/root/reference/src/pdf_extractor/extractor.py:112-118)."""

from __future__ import annotations

import unicodedata

import pandas as pd
import pytest

from document_extraction_spark.core import normalize as N

FENCE_CASES = [
    ("```json\n{\"a\": 1}\n```", '{"a": 1}'),
    ("```\nhello\n```", "hello"),
    ("```", ""),
    ("`` `", "`` `"),
    ("``` ```", ""),
    # sequential slices: ```json stripped, then the *result* starts with ```
    ("```json```x```", "x"),
    ("no fences at all", "no fences at all"),
    ("  ```json\n1\n```  ", "1"),
    ("```json\n{\"broken\": \n```", '{"broken":'),
]


@pytest.mark.parametrize("raw,expected", FENCE_CASES)
def test_fence_strip_reference_semantics(raw, expected):
    assert N.fence_strip_one(raw) == expected


def _reference_fence(raw: str) -> str:
    # literal transcription of extractor.py:112-118 for differential testing
    cleaned = raw.strip()
    if cleaned.startswith("```json"):
        cleaned = cleaned[7:]
    if cleaned.startswith("```"):
        cleaned = cleaned[3:]
    if cleaned.endswith("```"):
        cleaned = cleaned[:-3]
    return cleaned.strip()


@pytest.mark.parametrize("raw", [c for c, _ in FENCE_CASES] + ["```j", "``", ""])
def test_fence_strip_matches_reference_transcription(raw):
    assert N.fence_strip_one(raw) == _reference_fence(raw)


def test_normalize_nfc_crlf_whitespace():
    nfd = unicodedata.normalize("NFD", "café")
    assert N.normalize_one(nfd) == "café"
    assert N.normalize_one("a\r\nb\rc") == "a\nb\nc"
    assert N.normalize_one("a \t  b") == "a b"
    assert N.normalize_one("  line1  \n   line2\n\n\n\n\nline3 ") == "line1\nline2\n\nline3"
    assert N.normalize_one(None) == ""
    assert N.normalize_one("   \t ") == ""


def test_scalar_vs_vectorized_equality():
    cases = [c for c, _ in FENCE_CASES] + [
        None, "", " ", "a\r\nb", unicodedata.normalize("NFD", "crème brûlée"),
        "x\n\n\n\ny", " nbsp em", "tab\there",
    ]
    ser = pd.Series(cases, dtype="object")
    vec = N.normalize_series(ser).tolist()
    scalar = [N.normalize_one(c) for c in cases]
    assert vec == scalar


def test_paragraph_spans_offsets():
    text = "para one\n\npara two longer"
    spans = N.paragraph_spans(text, "plain")
    assert spans == [
        {"kind": "plain", "start": 0, "end": 8},
        {"kind": "plain", "start": 10, "end": 25},
    ]
    for s in spans:
        assert "\n" not in text[s["start"]:s["end"]]
    assert N.paragraph_spans("", "plain") == []
