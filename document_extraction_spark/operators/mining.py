"""Reciprocal best-match pair mining — the bitext/parallel-corpus mining
shape (Artetxe & Schwenk 2019's margin-based mining, minus the margin term):
a candidate pair (l, r) across two corpora survives iff r is l's nearest
neighbour in the right corpus AND l is r's nearest neighbour in the left.
Mutuality is the classic high-precision filter: one-directional top-1 pairs
include every hub vector's spurious matches; requiring both directions
removes them with no threshold to tune.

Distributed shape (scores computed ONCE — structurally, not by cache):
- one broadcast cross product left x right scored with the repo's standard
  cosine formulation (operators/similarity.py — rank on the raw double,
  vec_id tiebreak, round only at the edge: the q_ann_topk-proven
  exactness recipe);
- mutuality needs NO self-join: a pair (l, r) is mutual iff the SAME
  scored row has row_number 1 under both partitionings, so the two
  argmax windows chain over one scored child (plan-shape pinned: exactly
  one scoring join node — a naive `best_l JOIN best_r` re-evaluates the
  whole cross product per branch, doubling the quadratic cost).

At 100 TB neither side is broadcastable and the cross product is the cost:
``mutual_top1_srp`` swaps the exact scorer for banded SRP-bucketed
candidates (similarity.py banding recipe — score only colliding buckets,
(band, bucket) equi-join so NEITHER side broadcasts), then applies the SAME
chained two-window mutuality filter, trading candidate recall for the
quadratic. At bands == n_planes (1 sign bit per band) the candidate set
converges to all informative pairs and the output equals the exact path —
test_mining_calibrate pins that equality on the sf0.001 embeddings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from document_extraction_spark.operators.similarity import (
    _checked_dim,
    _hyperplanes,
    cosine,
    cosine_pairs_arrow,
    srp_signature,
)


def mutual_top1_pairs(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cos: float | None = None,
) -> DataFrame:
    """(left_id, right_id, cos): pairs where each side is the other's
    top-1.  ``min_cos`` (on the rounded score) optionally drops weak mutual
    pairs — disjoint corpora can be mutually-nearest yet unrelated."""
    l = left.select(
        F.col(id_col).alias("left_id"), F.col(vec_col).alias("lvec")
    )
    r = right.select(
        F.col(id_col).alias("right_id"), F.col(vec_col).alias("rvec")
    )
    scored = (
        l.crossJoin(F.broadcast(r))
        # two-step projection so the O(dim) cosine evaluates once per pair
        .select(
            "left_id",
            "right_id",
            cosine(F.col("lvec"), F.col("rvec")).alias("_raw"),
        )
        .select("left_id", "right_id", F.col("_raw"), F.round("_raw", 4).alias("cos"))
    )
    return _mutual_filter(scored, min_cos)


def _mutual_filter(scored: DataFrame, min_cos: float | None) -> DataFrame:
    """Chained two-window mutuality over one scored child (columns
    left_id, right_id, _raw, cos): a pair is mutual iff the SAME row has
    row_number 1 under both partitionings — no self-join, the scored
    subtree is read once."""
    w_l = Window.partitionBy("left_id").orderBy(F.col("_raw").desc(), "right_id")
    w_r = Window.partitionBy("right_id").orderBy(F.col("_raw").desc(), "left_id")
    out = (
        scored.withColumn("rk_l", F.row_number().over(w_l))
        .withColumn("rk_r", F.row_number().over(w_r))
        .where((F.col("rk_l") == 1) & (F.col("rk_r") == 1))
        .select("left_id", "right_id", "cos")
    )
    if min_cos is not None:
        out = out.where(F.col("cos") >= min_cos)
    return out


def _mutual_filter_agg(scored: DataFrame, min_cos: float | None) -> DataFrame:
    """Aggregate-form mutuality — same verdict as :func:`_mutual_filter`,
    built for candidate streams too large to window-sort: each side's
    argmax is ``max(struct(_raw, -other_id))`` (ties on _raw pick the
    SMALLEST other id, exactly row_number's orderBy(_raw desc, id) —
    struct max compares fields left to right, and Spark orders NaN above
    every double in both sorts and max, so the verdict is identical), and
    a pair is mutual iff the two argmax rows coincide.  Hash aggregation
    does map-side partial combine, so a |candidates|-row stream collapses
    to |corpus|-row tables BEFORE any exchange — the two full
    sort-shuffles of the window form (25M rows each at sf1.0) become two
    tiny aggregations plus one broadcast-able semi-join.  Duplicate
    candidate rows (a pair colliding in several bands) carry identical
    _raw and are absorbed by the max, so no upstream pair-dedup shuffle
    is needed either.  ``scored`` is materialized once (localCheckpoint —
    the dedup.py candidates recipe) because both directions aggregate it."""
    s = scored.localCheckpoint(eager=False)
    best_l = s.groupBy("left_id").agg(
        F.max(F.struct(F.col("_raw"), (-F.col("right_id")).alias("_nr"))).alias("m")
    )
    best_r = s.groupBy("right_id").agg(
        F.max(F.struct(F.col("_raw"), (-F.col("left_id")).alias("_nl"))).alias("m")
    )
    bl = best_l.select(
        "left_id",
        (-F.col("m._nr")).alias("right_id"),
        F.col("m._raw").alias("_raw"),
    )
    br = best_r.select((-F.col("m._nl")).alias("left_id"), "right_id")
    out = bl.join(br, ["left_id", "right_id"], "left_semi").select(
        "left_id", "right_id", F.round("_raw", 4).alias("cos")
    )
    if min_cos is not None:
        out = out.where(F.col("cos") >= min_cos)
    return out


def mutual_top1_srp(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    bands: int = 4,
    dim: int = 64,
    seed: int = 1234,
    min_cos: float | None = None,
) -> DataFrame:
    """The non-broadcastable-scale variant of :func:`mutual_top1_pairs`:
    candidates come from a banded signed-random-projection (band, bucket)
    EQUI-join — both sides shuffle on the bucket key, neither broadcasts,
    so the plan survives two 100 TB corpora.  Each surviving candidate pair
    is scored exactly once (dedup on (left_id, right_id) BEFORE the O(dim)
    cosine), then the identical chained two-window mutuality filter runs
    over the candidate scores.

    Recall semantics: "top-1" is within the candidate set, so a pair whose
    true nearest neighbour never collides in any band can surface a
    second-best mutual pair instead; for cosine c a sign bit agrees with
    prob 1 - acos(c)/pi, so recall is tuned by bands x per-band bits
    exactly as in similarity.srp_near_dup_pairs.  At bands == n_planes
    (one bit per band) a pair misses every band only if ALL n sign bits
    disagree — probability (acos(c)/pi)^n, vanishing but nonzero, so
    equality with the exact path is probabilistic/data-dependent, not an
    invariant; it is pytest-pinned on the sf0.001 embeddings fixture
    (ADVICE r6: the earlier wording overclaimed convergence).

    Sizing at scale: expected candidate volume is ~bands * |L| * |R| /
    2^(n_planes/bands) for near-uniform buckets, i.e. QUADRATIC in corpus
    size at fixed planes.  Grow per-band bits with the corpus
    (bits ~ log2(|corpus|) keeps per-bucket occupancy constant), exactly
    like LSH band tuning in dedup.py; BENCH/MINING_SRP.json pins the
    recall/cost trade per setting on the sf0.1 embeddings.
    """
    if n_planes % bands != 0:
        raise ValueError(f"bands ({bands}) must divide n_planes ({n_planes})")
    per_band = n_planes // bands
    planes = _hyperplanes(dim, n_planes, seed)
    vec_ok = _checked_dim(F.col(vec_col), dim)

    def banded(df: DataFrame, id_out: str, vec_out: str) -> DataFrame:
        band_cols = [
            srp_signature(
                vec_ok, planes[b * per_band : (b + 1) * per_band]
            ).alias(f"_b{b}")
            for b in range(bands)
        ]
        sig = df.select(
            F.col(id_col).alias(id_out), F.col(vec_col).alias(vec_out), *band_cols
        )
        return sig.select(
            id_out,
            vec_out,
            F.explode(
                F.array(*[
                    F.concat_ws(
                        ":", F.lit(str(b)), F.col(f"_b{b}").cast("string")
                    )
                    for b in range(bands)
                ])
            ).alias("bucket"),
        )

    # Score at the bucket-join OUTPUT, before any further exchange: the
    # joined stream flows straight into the zero-copy mapInArrow cosine
    # kernel (bit-exact to the HOF `cosine` — similarity.cosine_pairs_arrow,
    # which also documents why the pandas_udf and flat-expression variants
    # lost), so the heavy vector payload crosses exactly ONE shuffle per
    # side (the banded bucket exchange) and everything downstream carries
    # only (left_id, right_id, _raw) — 24 bytes/row instead of two vectors
    # (guide §2.3/§8: decide on light rows, never re-shuffle payloads).
    # A pair colliding in several bands is scored once per collision
    # (identical double each time — same inputs, same kernel); the
    # aggregate mutuality filter absorbs the duplicates, so the old
    # dropDuplicates exchange (25M rows x two vectors ~ 25 GB at sf1.0)
    # is gone outright.
    scored = cosine_pairs_arrow(
        banded(left, "left_id", "lvec")
        .join(banded(right, "right_id", "rvec"), "bucket")
        .select("left_id", "right_id", "lvec", "rvec"),
        "lvec",
        "rvec",
    )
    return _mutual_filter_agg(scored, min_cos)
