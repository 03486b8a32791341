from __future__ import annotations

from document_extraction_spark.core.pdf_layout import pdf_layout_one


def test_reading_order_single_column():
    # tokens deliberately out of order: parser must sort by y then x
    payload = "\n".join([
        "world@60.0,40.0",
        "hello@10.0,40.0",
        "line2b@60.0,52.0",
        "line2a@10.0,52.0",
        "block2@10.0,120.0",
    ])
    blocks, n_kept, n_dropped, failed = pdf_layout_one(payload)
    assert not failed and n_dropped == 0
    assert blocks == ["hello world\nline2a line2b", "block2"]
    assert n_kept == 2


def test_two_column_reading_order():
    # left column read fully before right column despite interleaved y
    payload = "\n".join([
        "R1@320.0,40.0",
        "L1@50.0,40.0",
        "R2@320.0,52.0",
        "L2@50.0,52.0",
    ])
    blocks, *_ = pdf_layout_one(payload)
    assert blocks == ["L1\nL2", "R1\nR2"]


def test_malformed_tokens_counted_dropped():
    blocks, n_kept, n_dropped, failed = pdf_layout_one("tok@1,2\nnot a token line\nword@3.5,4")
    assert not failed
    assert n_dropped == 1
    assert blocks and "tok" in blocks[0]


def test_all_garbage_is_parse_failed():
    blocks, n_kept, n_dropped, failed = pdf_layout_one("just some prose")
    assert failed and blocks == []


def test_multi_page_formfeed():
    payload = "a@1,1\nb@1,13\n\fc@1,1"
    blocks, n_kept, _, _ = pdf_layout_one(payload)
    assert blocks == ["a\nb", "c"]
