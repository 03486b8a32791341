"""Round-4 curation additions: A-ES weighted sampling, embedding-space
decontamination, unigram drift. Value parity vs DuckDB is the driver
contract (q_weighted_sample / q_semantic_decontaminate / q_corpus_drift);
these pin the semantic invariants."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_weighted_sample_deterministic_and_sized(spark):
    from document_extraction_spark.operators.sampling import weighted_sample_n

    df = spark.createDataFrame(
        [(i, float(1 + i % 5)) for i in range(200)], "doc_id long, w double"
    )
    a = sorted(r["doc_id"] for r in weighted_sample_n(df, 30, "w", "doc_id").collect())
    b = sorted(
        r["doc_id"]
        for r in weighted_sample_n(df.repartition(7), 30, "w", "doc_id").collect()
    )
    assert a == b and len(a) == 30          # partitioning-independent draw
    c = sorted(
        r["doc_id"]
        for r in weighted_sample_n(df, 30, "w", "doc_id", salt="other").collect()
    )
    assert c != a                            # salt draws an independent sample


def test_weighted_sample_bias_follows_weights(spark):
    """Inclusion probability must rise with weight: across many disjoint
    salts, heavy rows (w=20) should be picked far more often than light rows
    (w=1) — A-ES gives P(include) ~ w for n << N."""
    from document_extraction_spark.operators.sampling import weighted_sample_n

    rows = [(i, 20.0 if i < 50 else 1.0) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w double").cache()
    heavy_hits = light_hits = 0
    for s in range(8):
        got = weighted_sample_n(df, 50, "w", "doc_id", salt=f"s{s}").collect()
        heavy_hits += sum(1 for r in got if r["doc_id"] < 50)
        light_hits += sum(1 for r in got if r["doc_id"] >= 50)
    # heavy pool: 50 rows at weight 20 (1000 mass) vs 450 rows at 1 (450):
    # expect roughly 2/3 of picks heavy; require a clear majority
    assert heavy_hits > light_hits, (heavy_hits, light_hits)
    df.unpersist()


def test_weighted_sample_rejects_and_excludes(spark):
    from document_extraction_spark.operators.sampling import weighted_sample_n

    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -4.0), (4, 2.0)], "doc_id long, w double"
    )
    got = sorted(r["doc_id"] for r in weighted_sample_n(df, 10, "w", "doc_id").collect())
    assert got == [1, 4]                     # w <= 0 excluded, not errored
    with pytest.raises(ValueError, match="n must be"):
        weighted_sample_n(df, 0, "w", "doc_id")


def test_semantic_decontaminate_flags_paraphrase_neighbors(spark):
    from document_extraction_spark.operators.decontaminate import (
        semantic_decontaminate,
    )

    def unit(*v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    corpus = spark.createDataFrame(
        [
            (0, unit(1.0, 0.02, 0.0)),   # near-duplicate of eval vector e1
            (1, unit(0.0, 1.0, 0.0)),    # orthogonal to both eval vectors
            (2, unit(0.6, 0.0, 0.8)),    # partial overlap with e2
        ],
        "vec_id long, embedding array<float>",
    )
    evalset = spark.createDataFrame(
        [(100, unit(1.0, 0.0, 0.0)), (101, unit(0.0, 0.0, 1.0))],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["doc_id"]: r
        for r in semantic_decontaminate(corpus, evalset, threshold=0.9).collect()
    }
    assert got[0]["contaminated"] and got[0]["max_cos"] > 0.99
    assert not got[1]["contaminated"] and abs(got[1]["max_cos"]) < 1e-6
    assert not got[2]["contaminated"] and 0.7 < got[2]["max_cos"] < 0.9
    # every corpus row gets a verdict row (full audit, not just the flagged)
    assert set(got) == {0, 1, 2}


def test_unigram_drift_zero_for_identical_and_names_movers(spark):
    from document_extraction_spark.operators.drift import unigram_drift

    a = spark.createDataFrame(
        [(1, "alpha beta gamma alpha"), (2, "beta gamma delta")], ["id", "text"]
    )
    same = unigram_drift(a, a).collect()
    assert same and all(r["js"] == 0.0 for r in same)
    assert all(r["p_a"] == r["p_b"] for r in same)

    b = spark.createDataFrame(
        [(1, "alpha beta gamma alpha"), (2, "beta gamma spamword spamword spamword")],
        ["id", "text"],
    )
    drift = unigram_drift(a, b).collect()
    by_term = {r["term"]: r for r in drift}
    # the injected term leads the contribution ranking and is one-sided
    assert drift[0]["term"] == "spamword"
    assert by_term["spamword"]["p_a"] == 0.0 and by_term["spamword"]["p_b"] > 0.0
    # every contribution non-negative; total bounded by ln 2
    assert all(r["js"] >= 0.0 for r in drift)
    assert sum(r["js"] for r in drift) <= math.log(2) + 1e-9
