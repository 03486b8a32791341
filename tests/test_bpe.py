"""Distributed BPE training (operators/bpe.py): differential against a
pure-Python reference implementation of greedy leftmost BPE."""

from __future__ import annotations

import re
from collections import Counter

from document_extraction_spark.operators import bpe as B


def _ref_bpe(texts: list[str], rounds: int):
    """Pure-Python reference: word-frequency BPE with greedy leftmost
    merges and (count desc, pair asc) tie-break on wrapped-symbol pairs."""
    words = Counter()
    for t in texts:
        for w in t.lower().split():
            if re.fullmatch("[a-z]+", w):
                words[w] += 1
    segs = {w: ["<" + ch + ">" for ch in w] for w in words}
    merges = []
    for r in range(1, rounds + 1):
        pc = Counter()
        for w, c in words.items():
            s = segs[w]
            i = 0
            while i < len(s) - 1:
                pc[s[i] + s[i + 1]] += c
                i += 1
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, best[0], best[1]))
        a_b = best[0]
        merged = "<" + a_b.replace("<", "").replace(">", "") + ">"
        for w in segs:
            s = segs[w]
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] + s[i + 1] == a_b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges, segs


def test_merges_match_reference(spark):
    texts = [
        "lower lower lowest newer newer newest wider low low low",
        "the the the them then lower newer",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [(r["rank"], r["pair"], r["n"]) for r in
           B.bpe_merge_table(docs, rounds=5).orderBy("rank").collect()]
    exp, _ = _ref_bpe(texts, 5)
    assert got == exp


def test_segmentation_matches_reference(spark):
    texts = ["aaa aaa aa baa aab"]  # overlapping-pair stress: '<a><a>' merges
    docs = spark.createDataFrame([(0, texts[0])], "doc_id long, text string")
    merges, wt = B.bpe_train(docs, rounds=3)
    exp_merges, exp_segs = _ref_bpe(texts, 3)
    assert merges == exp_merges
    got_segs = {r["w"]: r["s"] for r in wt.collect()}
    for w, seg in exp_segs.items():
        assert got_segs[w] == "".join(seg), (w, got_segs[w], seg)


def test_vocab_counts(spark):
    docs = spark.createDataFrame(
        [(0, "ab ab ab cd")], "doc_id long, text string"
    )
    out = {r["symbol"]: (r["n_words"], r["total_count"]) for r in
           B.bpe_segment_counts(docs, rounds=1).collect()}
    # round 1 merges '<a><b>' (count 3) -> symbol '<ab>' covers word 'ab'
    assert out["<ab>"] == (1, 3)
    assert out["<c>"] == (1, 1) and out["<d>"] == (1, 1)
