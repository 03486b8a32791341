"""Deterministic sampling operators (operators/sampling.py).

The properties that distinguish these from df.sample(): a row's fate is a
pure function of its key (stable across partitionings and re-runs), exact-n
strata are exact, and salted draws are independent/disjoint.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_extraction_spark.operators import sampling as SP

N = 2000


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(N).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 10).cast("string").alias("stratum"),
    )


def test_quota_sample_budget_exact(spark, corpus):
    out = SP.stratified_quota_sample(corpus, ["stratum"], 173, "doc_id")
    rows = out.collect()
    assert len(rows) == 173
    # 10 equal strata of 200: quotas must be 17 or 18, never off by more
    per = {}
    for r in rows:
        per[r["stratum"]] = per.get(r["stratum"], 0) + 1
    assert set(per.values()) <= {17, 18}
    assert all(r["sample_rank"] <= r["quota"] for r in rows)


def test_quota_sample_full_budget_keeps_everything(spark, corpus):
    assert SP.stratified_quota_sample(corpus, ["stratum"], N, "doc_id").count() == N


def test_quota_sample_deterministic(spark, corpus):
    a = {r["doc_id"] for r in
         SP.stratified_quota_sample(corpus, ["stratum"], 50, "doc_id").collect()}
    b = {r["doc_id"] for r in
         SP.stratified_quota_sample(
             corpus.repartition(7), ["stratum"], 50, "doc_id").collect()}
    assert a == b and len(a) == 50


def test_fraction_threshold_bounds():
    assert SP.fraction_threshold(0.0) == "00000000"
    # 16^8 needs 9 hex digits, so every 8-digit prefix compares below it
    assert SP.fraction_threshold(1.0) == "100000000"
    with pytest.raises(ValueError):
        SP.fraction_threshold(1.5)


def test_hash_sample_fraction_and_determinism(corpus):
    s1 = SP.hash_sample(corpus, 0.3, "doc_id")
    ids1 = {r.doc_id for r in s1.collect()}
    # deterministic under a different partitioning
    ids2 = {r.doc_id for r in SP.hash_sample(corpus.repartition(13), 0.3, "doc_id").collect()}
    assert ids1 == ids2
    # binomial(2000, 0.3): mean 600, sd ~20.5 — 6 sigma
    assert 475 <= len(ids1) <= 725


def test_hash_sample_salts_independent(corpus):
    a = {r.doc_id for r in SP.hash_sample(corpus, 0.5, "doc_id", salt="a").collect()}
    b = {r.doc_id for r in SP.hash_sample(corpus, 0.5, "doc_id", salt="b").collect()}
    assert a != b
    # independent draws: overlap ~25% of N, nowhere near 0 or min(|a|,|b|)
    inter = len(a & b)
    assert 0.15 * N < inter < 0.35 * N


def test_train_valid_split_disjoint_exhaustive(corpus):
    tagged = SP.train_valid_split(corpus, 0.2, "doc_id")
    counts = {r["split"]: r["count"] for r in tagged.groupBy("split").count().collect()}
    assert counts["train"] + counts["valid"] == N
    assert 0.12 * N < counts["valid"] < 0.28 * N
    # re-tagging yields the identical assignment
    again = SP.train_valid_split(corpus.repartition(7), 0.2, "doc_id")
    diff = (
        tagged.join(again.withColumnRenamed("split", "split2"), "doc_id")
        .filter(F.col("split") != F.col("split2"))
        .count()
    )
    assert diff == 0


def test_stratified_exact_n(corpus):
    out = SP.stratified_sample_exact(corpus, ["stratum"], 5, "doc_id")
    per = {r["stratum"]: r["n"] for r in
           out.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert per == {str(i): 5 for i in range(10)}
    ranks = {r.sample_rank for r in out.select("sample_rank").distinct().collect()}
    assert ranks == {1, 2, 3, 4, 5}


def test_stratified_small_stratum_keeps_all(spark):
    tiny = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id long, stratum string"
    )
    out = SP.stratified_sample_exact(tiny, ["stratum"], 5, "doc_id")
    assert out.count() == 3


def test_stratified_deterministic_across_partitionings(corpus):
    a = sorted(
        (r.stratum, r.doc_id, r.sample_rank)
        for r in SP.stratified_sample_exact(corpus, ["stratum"], 5, "doc_id").collect()
    )
    b = sorted(
        (r.stratum, r.doc_id, r.sample_rank)
        for r in SP.stratified_sample_exact(
            corpus.repartition(17), ["stratum"], 5, "doc_id"
        ).collect()
    )
    assert a == b


def test_hash_sample_is_scan_side_filter(corpus):
    plan = SP.hash_sample(corpus, 0.3, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only: no shuffle introduced


def test_stratified_kfold_balance_and_determinism(spark):
    from document_extraction_spark.operators.sampling import stratified_kfold
    from pyspark.sql import functions as F

    rows = [(i, "a" if i < 53 else "b") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_kfold(df, "lang", "doc_id", k=5)
    sizes = {
        (r["lang"], r["fold"]): r["n"]
        for r in out.groupBy("lang", "fold").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # per class, folds balanced within one row
    for lang, total in (("a", 53), ("b", 47)):
        per = [sizes[(lang, f)] for f in range(5)]
        assert sum(per) == total and max(per) - min(per) <= 1
    # deterministic: identical assignment on re-run
    a1 = sorted(map(tuple, out.select("doc_id", "fold").collect()))
    a2 = sorted(map(tuple,
                    stratified_kfold(df, "lang", "doc_id", k=5)
                    .select("doc_id", "fold").collect()))
    assert a1 == a2
