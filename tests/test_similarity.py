from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from document_extraction_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(42)
    base = rng.standard_normal((40, 16)).astype(np.float32)
    # vec 1 = vec 0 + tiny noise -> guaranteed nearest neighbour
    base[1] = base[0] + 0.01 * rng.standard_normal(16).astype(np.float32)
    rows = [(i, [float(x) for x in base[i]], int(i % 4)) for i in range(40)]
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_brute_force_topk_exact(spark, emb):
    out = SIM.brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=5).collect()
    assert len(out) == 5
    assert out == sorted(out, key=lambda r: r["rank"])
    top = [r for r in out if r["rank"] == 1][0]
    assert top["vec_id"] == 1  # the planted near-duplicate
    assert top["cos"] > 0.99
    assert all(r["vec_id"] != 0 for r in out)  # self excluded


def test_brute_force_arrow_equals_hof(spark, emb, testdata_dir):
    """The Arrow matmul top-k must reproduce the HOF path row-for-row —
    ranks, 4-decimal cosines, tie-breaks — on the synthetic fixture AND the
    real embeddings table (multi-query, multi-partition)."""
    a = sorted(map(tuple, SIM.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 3), k=5).collect()))
    b = sorted(map(tuple, SIM.brute_force_topk_arrow(
        emb, emb.filter(F.col("vec_id") < 3), k=5).collect()))
    assert a == b and len(a) == 15
    real = spark.read.parquet(f"{testdata_dir}/sf0.01/embeddings.parquet")
    q = real.filter(F.col("vec_id") < 5)
    a2 = sorted(map(tuple, SIM.brute_force_topk(real, q, k=10).collect()))
    b2 = sorted(map(tuple,
                    SIM.brute_force_topk_arrow(real.repartition(7), q, k=10).collect()))
    assert a2 == b2 and len(a2) == 50


def test_srp_lsh_subset_of_exact_ranking(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3)
    exact = SIM.brute_force_topk(emb, queries, k=10).collect()
    approx = SIM.srp_lsh_topk(emb, queries, k=10, n_planes=4, dim=16).collect()
    exact_cos = {(r["query_id"], r["vec_id"]): r["cos"] for r in exact}
    # every approx hit's cosine must equal the exact computation
    for r in approx:
        key = (r["query_id"], r["vec_id"])
        if key in exact_cos:
            assert r["cos"] == exact_cos[key]
    # the planted near-dup shares all sign bits -> must be found for query 0
    got_q0 = {r["vec_id"] for r in approx if r["query_id"] == 0}
    assert 1 in got_q0


def test_ivf_topk_recall(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3)
    exact = SIM.brute_force_topk(emb, queries, k=5).collect()
    approx = SIM.ivf_topk(emb, queries, k=5, n_lists=4, n_probe=2,
                          sample_n=40).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    hit = total = 0
    for r in approx:
        total += 1
        hit += r["vec_id"] in exact_sets[r["query_id"]]
    assert total > 0
    assert hit / max(total, 1) >= 0.5  # half the lists probed -> decent recall
    # full probe degenerates to exact: identical top-5 sets
    full = SIM.ivf_topk(emb, queries, k=5, n_lists=4, n_probe=4, sample_n=40).collect()
    full_sets = {}
    for r in full:
        full_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert full_sets == exact_sets
    # the planted near-dup of query 0 must land in the same list
    got_q0 = {r["vec_id"] for r in approx if r["query_id"] == 0}
    assert 1 in got_q0


def test_embedding_near_dup_blocking(spark, emb):
    # planted pair (0,1): same block (labels 0 and 1 differ!) -> adjust: both i%4
    # 0%4=0, 1%4=1 -> different blocks; so test blocking excludes the pair
    pairs = SIM.embedding_near_dup_pairs(emb, threshold=0.99).collect()
    assert all(r["id_a"] % 4 == r["id_b"] % 4 for r in pairs)


def test_embedding_near_dup_finds_planted_pair_same_block(spark):
    rng = np.random.default_rng(1)
    v = rng.standard_normal(8).astype(np.float32)
    rows = [
        (0, [float(x) for x in v], 0),
        (1, [float(x) for x in v * 1.001], 0),   # same direction, same block
        (2, [float(x) for x in rng.standard_normal(8)], 0),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    pairs = {(r["id_a"], r["id_b"]): r["cos"] for r in SIM.embedding_near_dup_pairs(df, 0.99).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] >= 0.999


def test_srp_near_dup_precision_and_recall(spark, emb):
    """SRP-banded near-dup pairs: every emitted pair must match the exact
    all-pairs answer at the threshold (precision 1.0 — pairs are exactly
    verified), and the planted near-duplicate pair must be recalled."""
    exact = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in SIM.embedding_near_dup_pairs(
            emb.withColumn("label", F.lit(0)), threshold=0.9
        ).collect()
    }
    got = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in SIM.srp_near_dup_pairs(
            emb, threshold=0.9, n_planes=8, bands=4, dim=16
        ).collect()
    }
    assert set(got) <= set(exact)          # precision 1.0
    assert (0, 1) in got                    # planted pair recalled
    for k, v in got.items():
        assert v == exact[k]                # identical verified cosines


def test_srp_rejects_dim_mismatch(spark, emb):
    """dim != actual embedding length must fail loudly: zip_with null-pads,
    the dot product goes NULL, every sign bit falls to 0, and all vectors
    share one bucket per band — the quadratic blowup SRP exists to prevent."""
    with pytest.raises(Exception, match="SRP hyperplanes|USER_RAISED"):
        SIM.srp_near_dup_pairs(emb, dim=64).collect()  # embeddings are 16-dim
    with pytest.raises(Exception, match="SRP hyperplanes|USER_RAISED"):
        SIM.srp_lsh_topk(emb, emb.limit(2), dim=64).collect()


def test_srp_near_dup_rejects_bad_bands(spark, emb):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="must divide"):
        SIM.srp_near_dup_pairs(emb, n_planes=8, bands=3, dim=16)
