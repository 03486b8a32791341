from __future__ import annotations

import pytest

from document_extraction_spark.operators import dedup as DD


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
        (2, "THE  QUICK   brown fox JUMPS over the lazy dog"),  # case/ws dup of 0
        (3, "the quick brown fox jumps over the sleepy dog"),  # near dup
        (4, "completely different text about spark partitions and shuffles"),
        (5, "completely different text about spark partitions and shuffles ok"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_groups(spark, docs):
    out = {r["keep_id"]: r["n_docs"] for r in DD.exact_dedup(docs).collect()}
    assert out[0] == 3  # 0, 1, 2 share a fingerprint (casefold + ws collapse)
    assert out[3] == 1
    assert out[4] == 1 and out[5] == 1


def test_minhash_identical_docs_collide(spark, docs):
    sig = DD.minhash_signatures(docs)
    pairs = {(r["doc_a"], r["doc_b"]) for r in DD.lsh_candidate_pairs(sig).collect()}
    assert (0, 1) in pairs  # identical docs always share all bands
    assert (0, 2) in pairs
    # near-dup (one word differs) should share at least one band with high
    # probability given 4 bands of 2 hashes; don't assert (probabilistic),
    # but disjoint docs must NOT collide on all bands
    assert (0, 4) not in pairs


def test_ngram_jaccard_values(spark, docs):
    out = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in DD.ngram_jaccard_pairs(docs, threshold=0.1).collect()
    }
    assert out[(0, 1)] == 1.0
    assert out[(0, 2)] == 1.0
    assert 0.1 <= out[(0, 3)] < 1.0
    assert (0, 4) not in out


def test_simhash_properties(spark, docs):
    sigs = {r["doc_id"]: r["simhash"] for r in DD.simhash(docs).collect()}
    assert sigs[0] == sigs[1]  # identical text
    assert sigs[0] == sigs[2]  # tokens casefolded
    ham_near = bin(sigs[0] ^ sigs[3]).count("1")
    ham_far = bin(sigs[0] ^ sigs[4]).count("1")
    assert ham_near < ham_far
    assert all(0 <= s < 2 ** DD.SIMHASH_BITS for s in sigs.values())
