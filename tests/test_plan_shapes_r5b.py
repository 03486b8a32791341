"""Plan-shape audits for the late-round-5 operator generation (batches
9-13): the physical plans these operators PROMISE in their docstrings,
pinned so a refactor that silently degrades them fails fast.

Promises under audit:
- bpe_encode: pure map-only — ZERO exchanges in the encode plan;
- apportion: scalar aggregates return as broadcast joins, exactly one
  global window (no extra data shuffle of the key table);
- kmv build: one distinct shuffle + one group-keyed window, nothing else;
- mutual_top1: the right corpus rides ONE broadcast; scoring happens once
  (a single cross-product node feeds both argmax windows);
- cusum_changepoints: every window reuses ONE series-key exchange;
- quantile_normalize: exactly one exchange (the group-key window).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _exchanges(plan: str) -> int:
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )


def test_bpe_encode_is_map_only(spark):
    from document_extraction_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame(
        [(i, "lower lowest low") for i in range(20)], "doc_id long, text string"
    )
    plan = _plan(bpe_encode(docs, [(1, "<l><o>", 3), (2, "<lo><w>", 2)]))
    assert _exchanges(plan) == 0 and "Exchange" not in plan


def test_apportion_scalars_broadcast_one_window(spark):
    from document_extraction_spark.operators.apportion import apportion

    hosts = spark.range(0, 500).select(
        F.concat(F.lit("h"), F.col("id")).alias("host"),
        (F.col("id") + 1).alias("w"),
    )
    plan = _plan(apportion(hosts, "host", "w", budget=1000))
    # ONE scalar broadcast (the weight total); the leftover sum rides the
    # rank window's single-partition exchange instead of a second
    # aggregate branch that would re-scan the key table
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_kmv_build_two_bounded_exchanges(spark):
    from document_extraction_spark.operators.kmv import kmv_build

    vals = spark.range(0, 5000).selectExpr("'g' AS g", "id AS v")
    plan = _plan(kmv_build(vals, "v", ["g"], k=64))
    # distinct agg + the group-keyed rank window; AQE may reuse the
    # partitioning, so allow <= 2 but never more
    assert _exchanges(plan) <= 2
    assert "Window" in plan


def test_mutual_top1_single_broadcast_single_scoring(spark):
    from document_extraction_spark.operators.mining import mutual_top1_pairs

    left = spark.range(0, 50).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(7), F.rand(11)).cast("array<float>").alias("embedding"),
    )
    right = spark.range(100, 150).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(3), F.rand(5)).cast("array<float>").alias("embedding"),
    )
    plan = _plan(mutual_top1_pairs(left, right))
    # one broadcast of the right corpus, ONE scoring node: mutuality is a
    # same-row predicate over two chained windows, never a self-join that
    # would re-evaluate the cross product per branch
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "Cartesian" not in plan
    assert plan.count("row_number() windowspecdefinition") == 2
    # bonus: Spark pushes a partial top-1 below the second window's
    # exchange (WindowGroupLimit), so only per-partition winners shuffle
    assert "WindowGroupLimit" in plan


def test_cusum_windows_share_one_exchange(spark):
    from document_extraction_spark.operators.changepoint import cusum_changepoints

    rows = spark.createDataFrame(
        [("a", t, t % 7) for t in range(50)], "g string, t int, x long"
    )
    plan = _plan(cusum_changepoints(rows, "g", "t", "x"))
    # count/total window, ordered cumsum window, argmax window — all keyed
    # by g: exactly ONE hash exchange on g in the whole plan
    assert _exchanges(plan) == 1


def test_quantile_normalize_single_exchange(spark):
    from document_extraction_spark.operators.calibrate import quantile_normalize

    rows = spark.createDataFrame(
        [("s", i, float(i % 13)) for i in range(200)],
        "src string, doc_id long, score double",
    )
    plan = _plan(quantile_normalize(rows, "score", "src", "doc_id"))
    assert _exchanges(plan) == 1 and plan.count("Window") == 1
