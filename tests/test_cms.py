"""Count-min sketch (operators/cms.py): one-sided error (never undercount),
exactness when collision-free, merge linearity, and bounded sketch size."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from document_extraction_spark.operators import cms as CMS

WORDS = [f"w{i}" for i in range(40)]
STREAM = [WORDS[i % 40] for i in range(400)] + ["hot"] * 120


def _stream_df(spark, items):
    return spark.createDataFrame([(w,) for w in items], "token string")


def test_never_undercounts_even_with_collisions(spark):
    df = _stream_df(spark, STREAM)
    sk = CMS.cms_build(df, "token", width=8, depth=3)  # tiny: forced collisions
    probes = df.select("token").distinct()
    est = {
        r.token: r.est_cnt
        for r in CMS.cms_estimate(sk, probes, "token", width=8, depth=3).collect()
    }
    true = Counter(STREAM)
    assert set(est) == set(true)
    assert all(est[t] >= c for t, c in true.items())
    # width=8 over 41 distinct values MUST collide somewhere
    assert any(est[t] > c for t, c in true.items())


def test_exact_when_wide(spark):
    df = _stream_df(spark, STREAM)
    sk = CMS.cms_build(df, "token", width=CMS.WIDTH, depth=CMS.DEPTH)
    probes = df.select("token").distinct()
    est = {r.token: r.est_cnt for r in CMS.cms_estimate(sk, probes, "token").collect()}
    true = Counter(STREAM)
    # 41 values into 4 independent rows of 1024 buckets: min over rows is
    # exact unless a value collides in EVERY row (p ~ (41/1024)^4).
    assert est == dict(true)


def test_merge_equals_build_on_union(spark):
    a, b = STREAM[:260], STREAM[260:]
    merged = CMS.cms_merge(
        CMS.cms_build(_stream_df(spark, a), "token", width=16, depth=2),
        CMS.cms_build(_stream_df(spark, b), "token", width=16, depth=2),
    )
    direct = CMS.cms_build(_stream_df(spark, STREAM), "token", width=16, depth=2)
    m = {(r.row, r.bucket): r.cnt for r in merged.collect()}
    d = {(r.row, r.bucket): r.cnt for r in direct.collect()}
    assert m == d


def test_sketch_size_bounded(spark):
    df = _stream_df(spark, STREAM)
    sk = CMS.cms_build(df, "token", width=8, depth=3)
    assert sk.count() <= 8 * 3
    assert sk.agg(F.sum("cnt")).collect()[0][0] == len(STREAM) * 3


def test_unseen_probe_estimates_zero(spark):
    sk = CMS.cms_build(_stream_df(spark, STREAM), "token", width=CMS.WIDTH)
    probes = _stream_df(spark, ["never-seen-token-xyz"])
    est = CMS.cms_estimate(sk, probes, "token").collect()
    assert est[0].est_cnt == 0
