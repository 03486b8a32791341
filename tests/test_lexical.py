"""Lexical-diversity QC (operators/lexical.py): hand-computed TTR / hapax /
mean token length, casefolding, and null/empty handling."""

from __future__ import annotations

from document_extraction_spark.operators.lexical import lexical_diversity


def test_hand_computed_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat and The dog and the bird"),
            (2, "unique words only here"),
            (3, None),
            (4, "   "),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in lexical_diversity(docs).collect()}
    # doc 1 casefolds: the x3, and x2, cat, dog, bird -> 8 tokens, 5 types
    r = out[1]
    assert (r["n_tokens"], r["n_types"], r["n_hapax"]) == (8, 5, 3)
    assert r["ttr"] == round(5 / 8, 4)
    assert r["hapax_frac"] == round(3 / 5, 4)
    # chars: the*3*3 + and*3*2 + 3 + 3 + 4 = 9 + 6 + 10 = 25
    assert r["mean_tok_len"] == round(25 / 8, 4)
    r = out[2]
    assert (r["n_tokens"], r["n_types"], r["n_hapax"]) == (4, 4, 4)
    assert r["ttr"] == 1.0 and r["hapax_frac"] == 1.0
    # null and whitespace-only docs carry no tokens -> absent
    assert 3 not in out and 4 not in out


def test_low_ttr_flags_template_spam(spark):
    spam = "buy now " * 50
    prose = ("a genuinely varied sentence containing many different words "
             "that do not repeat themselves unnecessarily at all")
    docs = spark.createDataFrame(
        [(1, spam), (2, prose)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["ttr"] for r in lexical_diversity(docs).collect()}
    assert out[1] < 0.05 < 0.8 < out[2]
