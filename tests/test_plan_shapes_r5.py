"""Plan-shape audits for the round-5 operator generation: the physical
plans the operators PROMISE in their docstrings, asserted so a refactor
that silently degrades them (broadcast -> shuffle, pushed filter -> late
filter) fails fast."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bloom_probe_broadcasts_word_table(spark):
    from document_extraction_spark.operators import bloom

    members = spark.range(0, 200).select(F.col("id").alias("k"))
    probes = spark.range(0, 2000).select(F.col("id").alias("k"))
    out = bloom.bloom_prefilter(probes, "k", bloom.bloom_build(members, "k"))
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan  # word table rides a broadcast


def test_lm_score_scoring_plan_is_map_only(spark):
    """r7: the model (alphabet-bounded, <= 27^3 cells at ANY corpus size)
    rides the scoring kernel's closure, so the per-doc scoring plan is a
    pure map — no joins, no exchange, doc trigrams never shuffle.  (The
    pre-r7 pin asserted the model JOINS were broadcast; the joins are gone
    entirely now.)"""
    from document_extraction_spark.operators import lm_score as LM

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(50)],
        "doc_id long, text string",
    )
    plan = _plan(LM.lm_score(docs))
    assert "Exchange" not in plan and "Join" not in plan


def test_snapshot_diff_is_single_join_no_cartesian(spark):
    from document_extraction_spark.operators import cdc

    a = spark.range(0, 1000).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    b = spark.range(0, 1000).select(F.col("id").alias("k"), F.lit("y").alias("v"))
    plan = _plan(cdc.snapshot_diff(a, b, ["k"], ["v"]))
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") + plan.count(
        "BroadcastHashJoin"
    ) == 1


def test_phrase_search_filters_before_shuffle(spark):
    from document_extraction_spark.operators.search import phrase_search

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )
    plan = _plan(phrase_search(docs, ["alpha", "beta"]))
    lines = plan.splitlines()
    gen = next(i for i, ln in enumerate(lines) if "Generate posexplode" in ln)
    last_shuffle = max(
        i for i, ln in enumerate(lines) if "Exchange hashpartitioning" in ln
    )
    # the explode and its isin(phrase) filter sit BELOW every shuffle:
    # only phrase-term postings cross an exchange
    assert gen > last_shuffle
    flt = lines[gen - 1]
    assert "Filter" in flt and "IN (alpha,beta)" in flt


def test_rrf_fusion_stays_tiny_no_corpus_shuffle(spark):
    from document_extraction_spark.operators.hybrid_search import rrf_fuse

    s = spark.createDataFrame([(1, 1)], "doc_id long, rank int")
    d = spark.createDataFrame([(2, 1)], "doc_id long, rank int")
    plan = _plan(rrf_fuse(s, d))
    assert "TakeOrderedAndProject" in plan  # top-N, not a global sort


def test_quantized_topk_corpus_never_shuffles_prejoin(spark):
    from document_extraction_spark.operators import quantization as QZ

    df = spark.createDataFrame(
        [(i, [float(i), 1.0, 2.0]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    plan = _plan(QZ.quantized_topk(df, df.where("vec_id < 2"), k=3))
    # queries ride a broadcast; the only hash exchange is the final rank
    # window's partitionBy(query_id) — the corpus itself never shuffles
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    hash_exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(hash_exchanges) == 1 and "query_id" in hash_exchanges[0]


def test_outliers_exchanges_share_group_key(spark):
    from document_extraction_spark.operators.outliers import robust_outliers

    df = spark.createDataFrame(
        [(i, "k", float(i)) for i in range(100)],
        "event_id long, key string, value double",
    )
    plan = _plan(robust_outliers(df, "key", "value", "event_id"))
    # every hash exchange keys on the group column
    import re

    parts = [p for p in plan.splitlines() if "Exchange hashpartitioning" in p]
    assert parts, "expected hash exchanges"
    assert all("key" in p for p in parts)
