"""Sliding token-window chunking (operators/chunking.py). Value parity vs
DuckDB is q_sliding_chunks; invariants pinned here."""

from __future__ import annotations

import pytest


def test_sliding_chunks_overlap_and_tail(spark):
    from document_extraction_spark.operators.chunking import sliding_token_chunks

    text = " ".join(f"t{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame([(1, text), (2, "a b"), (3, ""), (4, None)],
                               ["doc_id", "text"])
    out = sliding_token_chunks(df, window=4, stride=3)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk"], r["n_tok"]))
    # 10 tokens, window 4 stride 3 -> ceil((10-4)/3)+1 = 3 chunks
    assert [c for c, _, _ in sorted(got[1])] == [0, 1, 2]
    chunks = [c for _, c, _ in sorted(got[1])]
    assert chunks[0] == "t0 t1 t2 t3"
    assert chunks[1] == "t3 t4 t5 t6"          # 1-token overlap (window-stride)
    assert chunks[2] == "t6 t7 t8 t9"
    assert all(n == 4 for _, _, n in got[1])
    # short doc -> one chunk, its own tokens
    assert got[2] == [(0, "a b", 2)]
    # empty text -> one empty chunk (kept: observable, not dropped)
    assert got[3] == [(0, "", 0)]
    # NULL text -> tokenizer yields NULL size -> no rows (filter upstream)
    assert 4 not in got


def test_sliding_chunks_every_token_covered(spark):
    """Coverage invariant: with stride <= window every source token appears
    in at least one chunk, and reassembling stride-prefixes reproduces the
    document."""
    from document_extraction_spark.operators.chunking import sliding_token_chunks

    text = " ".join(f"w{i}" for i in range(257))  # not a multiple of stride
    df = spark.createDataFrame([(7, text)], ["doc_id", "text"])
    rows = sorted(
        (r["chunk_idx"], r["chunk"]) for r in
        sliding_token_chunks(df, window=64, stride=48).collect()
    )
    # each chunk contributes its first `stride` tokens; the last contributes all
    pieces = []
    for idx, chunk in rows[:-1]:
        pieces.extend(chunk.split(" ")[:48])
    pieces.extend(rows[-1][1].split(" "))
    # dedupe the overlap between the final two chunks while preserving order
    seen = set()
    ordered = [t for t in pieces if not (t in seen or seen.add(t))]
    assert ordered == text.split(" ")


def test_sliding_chunks_rejects_bad_stride(spark):
    from document_extraction_spark.operators.chunking import sliding_token_chunks

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="stride"):
        sliding_token_chunks(df, window=4, stride=5)
    with pytest.raises(ValueError, match="stride"):
        sliding_token_chunks(df, window=4, stride=0)


def test_sliding_chunks_plan_is_map_only(spark):
    from document_extraction_spark.operators.chunking import sliding_token_chunks

    df = spark.createDataFrame([(1, "a b c d e f")], ["doc_id", "text"])
    plan = (
        sliding_token_chunks(df, window=4, stride=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # zero shuffles: runs at scan speed
