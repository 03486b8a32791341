from __future__ import annotations

from pyspark.sql import functions as F


def test_approx_aggs_within_error_bounds(spark):
    """Sketch aggregates can't be oracle-hashed cross-engine (the sketches
    differ by construction) — pin their accuracy against the exact answers
    instead: HLL++ default rsd is 5%; percentile_approx at the default
    accuracy should land within a tight rank neighborhood."""
    sf_dir = "/root/testdata/sf0.01"
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    approx = {
        r["event_type"]: r
        for r in e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.percentile_approx("value", 0.5).alias("approx_median"),
        )
        .collect()
    }
    exact = {
        r["event_type"]: r
        for r in e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("median"),
        )
        .collect()
    }
    assert set(approx) == set(exact) and len(exact) > 0
    for et, ex in exact.items():
        ap = approx[et]
        # HLL++ rsd 0.05 default; allow 3 sigma
        assert abs(ap["approx_users"] - ex["users"]) <= max(3, 0.15 * ex["users"]), et
        # approximate median within 10% of the exact median's magnitude
        assert abs(ap["approx_median"] - ex["median"]) <= 0.1 * max(abs(ex["median"]), 1.0), et


def test_hll_sketch_merge_matches_exact_within_tolerance(spark):
    """Mergeable HLL sketches: per-group sketches union to a global estimate
    equal to sketching the whole set directly, and within 5% of exact."""
    from pyspark.sql import functions as F

    n = 5000
    df = spark.range(n).select(
        (F.col("id") % 4).alias("g"), F.col("id").cast("string").alias("key")
    )
    per = df.groupBy("g").agg(F.hll_sketch_agg("key").alias("sk"))
    merged_est = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0]["est"]
    direct_est = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("key")).alias("est")
    ).collect()[0]["est"]
    assert merged_est == direct_est          # merge == sketch-of-union
    assert abs(merged_est - n) / n < 0.05    # sketch accuracy bound
