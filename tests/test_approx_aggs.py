from __future__ import annotations

from pyspark.sql import functions as F


def test_approx_aggs_within_error_bounds(spark, testdata_dir):
    """Sketch aggregates can't be oracle-hashed cross-engine (the sketches
    differ by construction) — pin their accuracy against the exact answers
    instead: HLL++ default rsd is 5%; percentile_approx at the default
    accuracy should land within a tight rank neighborhood."""
    sf_dir = f"{testdata_dir}/sf0.01"
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


def test_hll_sketches_persist_and_merge_across_runs(spark, tmp_path):
    """VERDICT r3 ask #5: sketches written by SEPARATE job runs to a parquet
    stats table must union, on read, to the distinct count over the union of
    the runs' inputs — the incremental corpus-profiling pattern. At this
    cardinality DataSketches HLL is still exact (list/set mode), so the
    round-trip is equality, not a tolerance."""
    from document_extraction_spark.operators.sketch_state import (
        append_distinct_sketches,
        merged_distinct_estimates,
    )
    from document_extraction_spark.sources.tableio import TableIO

    io = TableIO(spark, str(tmp_path))
    # run 1 sees users 0..59, run 2 sees 40..99 (overlap 40..59 must count once)
    def users(lo, hi):
        return spark.range(lo, hi).select(
            (F.col("id") % 2).alias("g"), F.col("id").alias("user")
        )

    append_distinct_sketches(io, users(0, 60), "stats", ["g"], "user", run_id="r1")
    append_distinct_sketches(io, users(40, 100), "stats", ["g"], "user", run_id="r2")

    got = {r["g"]: r for r in merged_distinct_estimates(io, "stats", ["g"]).collect()}
    exact = {
        r["g"]: r["d"]
        for r in users(0, 100)
        .groupBy("g")
        .agg(F.countDistinct("user").alias("d"))
        .collect()
    }
    assert set(got) == set(exact)
    for g, r in got.items():
        assert r["n_runs"] == 2
        assert r["distinct_est"] == exact[g]      # 50 per parity group
        assert r["n_rows"] == 30 + 30             # raw rows, overlap double-counted

    # a third run over rows already seen adds NO new distincts
    append_distinct_sketches(io, users(0, 100), "stats", ["g"], "user", run_id="r3")
    again = {r["g"]: r for r in merged_distinct_estimates(io, "stats", ["g"]).collect()}
    for g in exact:
        assert again[g]["distinct_est"] == exact[g]
        assert again[g]["n_runs"] == 3
