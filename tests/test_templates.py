"""Template mining (operators/templates.py): sentence, message, and gram
granularities."""

from __future__ import annotations

from document_extraction_spark.operators import templates as TPL


def test_sentence_templates_normalization(spark):
    docs = spark.createDataFrame(
        [
            (1, "Order 123 has shipped. Thanks!"),
            (2, "Order 9 has shipped. Bye."),
            (3, "order   77 HAS shipped. Other text."),
        ],
        "doc_id long, text string",
    )
    out = TPL.mine_templates(docs, min_df=3)
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["template"] == "order # has shipped"
    assert r["n_docs"] == 3 and r["n_occ"] == 3 and r["n_variants"] == 3


def test_message_templates_drain_style(spark):
    ev = spark.createDataFrame(
        [
            (1, '{"k": 12}'),
            (2, '{"k": 999}'),
            (1, '{"k": 12}'),
            (3, "unique payload"),
        ],
        "user_id long, props string",
    )
    out = {r["template"]: r for r in
           TPL.mine_message_templates(ev, "user_id", "props", min_df=2).collect()}
    assert set(out) == {'{"k": #}'}
    r = out['{"k": #}']
    assert r["n_docs"] == 2 and r["n_occ"] == 3 and r["n_variants"] == 2


def test_gram_templates_slot_variation(spark):
    docs = spark.createDataFrame(
        [(i, f"page {i * 7} of 99 end") for i in range(5)],
        "doc_id long, text string",
    )
    out = {r["template"]: r for r in TPL.mine_gram_templates(docs, n=3, min_df=5).collect()}
    assert "page # of" in out
    r = out["page # of"]
    assert r["n_docs"] == 5 and r["n_variants"] == 5  # 5 distinct raw forms
    assert out["# of #"]["n_variants"] == 5


def test_min_df_filters(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "x y z w")],
        "doc_id long, text string",
    )
    out = {r["template"] for r in TPL.mine_gram_templates(docs, n=3, min_df=2).collect()}
    assert out == {"a b c", "b c d"}
