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


def test_jaccard_verify_candidates_matches_full_join(spark, docs):
    """The scale path (LSH candidates -> keyed Jaccard verify) must equal the
    full shingle self-join wherever LSH recall is total — which holds on this
    fixture (all >=0.1-Jaccard pairs share a band)."""
    full = {
        (r["doc_a"], r["doc_b"]): (r["n_inter"], r["jaccard"])
        for r in DD.ngram_jaccard_pairs(docs, threshold=0.1).collect()
    }
    piped = {
        (r["doc_a"], r["doc_b"]): (r["n_inter"], r["jaccard"])
        for r in DD.near_dup_pairs_pipeline(docs, threshold=0.1).collect()
    }
    assert piped == full


def test_jaccard_verify_subset_of_candidates(spark, docs):
    """Verification never invents pairs outside the candidate set."""
    sig = DD.minhash_signatures(docs)
    cand = {(r["doc_a"], r["doc_b"]) for r in DD.lsh_candidate_pairs(sig).collect()}
    ver = DD.jaccard_verify_candidates(docs, DD.lsh_candidate_pairs(sig), threshold=0.0)
    got = {(r["doc_a"], r["doc_b"]) for r in ver.collect()}
    assert got <= cand


def test_jaccard_verify_max_shingle_df(spark, docs):
    """The document-frequency cap drops corpus-common shingles consistently
    from both numerator and denominator: with a cap of 1, no shingle is
    shared, so no pair survives any positive threshold."""
    sig = DD.minhash_signatures(docs)
    ver = DD.jaccard_verify_candidates(
        docs, DD.lsh_candidate_pairs(sig), threshold=0.1, max_shingle_df=1
    )
    assert ver.count() == 0


def test_null_and_empty_text_excluded_from_lsh(spark):
    """NULL/empty docs must not pair with each other (round-1 ADVICE: they
    all hashed to bucket md5('') on the Spark side while SQL oracles
    propagated NULL and emitted nothing)."""
    rows = [
        (0, "shared words for a real pair of documents here"),
        (1, "shared words for a real pair of documents too"),
        (2, None),
        (3, None),
        (4, ""),
        (5, "   "),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sig = DD.minhash_signatures(docs)
    assert {r["doc_id"] for r in sig.collect()} == {0, 1}
    pairs = {(r["doc_a"], r["doc_b"]) for r in DD.lsh_candidate_pairs(sig).collect()}
    assert all(a in (0, 1) and b in (0, 1) for a, b in pairs)
    assert {r["doc_id"] for r in DD.simhash(docs).collect()} == {0, 1}


def test_simhash_properties(spark, docs):
    sigs = {r["doc_id"]: r["simhash"] for r in DD.simhash(docs).collect()}
    assert sigs[0] == sigs[1]  # identical text
    assert sigs[0] == sigs[2]  # tokens casefolded
    ham_near = bin(sigs[0] ^ sigs[3]).count("1")
    ham_far = bin(sigs[0] ^ sigs[4]).count("1")
    assert ham_near < ham_far
    assert all(0 <= s < 2 ** DD.SIMHASH_BITS for s in sigs.values())


def test_lsh_max_bucket_size_drops_hot_bucket(spark):
    """All-identical docs form one hot bucket of n docs (n^2 pairs); the cap
    removes it entirely, while distinct docs' buckets survive."""
    rows = [(i, "same exact text repeated across every document") for i in range(10)]
    rows += [(100, "one unusual document that stands alone quietly"),
             (101, "one unusual document that stands alone quietly today")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sig = DD.minhash_signatures(docs)
    uncapped = DD.lsh_candidate_pairs(sig)
    assert uncapped.count() >= 45  # the 10-dup clique alone is C(10,2)
    capped = DD.lsh_candidate_pairs(sig, max_bucket_size=5)
    pairs = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert all(a >= 100 for a, _ in pairs)  # clique gone, odd pair intact
    assert (100, 101) in pairs
