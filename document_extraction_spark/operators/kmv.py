"""KMV (k-minimum-values / bottom-k) distinct-count sketch — the mergeable
cardinality sketch family behind theta sketches (Bar-Yossef et al. 2002;
Beyer et al. SIGMOD'07).

Where HLL (operators/sketch_state.py) gives a fixed-size register array,
KMV keeps the k smallest hash values of the set.  That buys two things HLL
cannot give us here:

- **rank-exactness**: "the k smallest 52-bit md5 integers of a distinct
  set" is a deterministic, engine-independent value — the ENTIRE sketch
  (not just the estimate) hash-verifies against a DuckDB twin, which no
  float-register sketch can do;
- **closure under union by construction**: the bottom-k of a union equals
  the bottom-k of the concatenated per-part sketches (any global bottom-k
  element is bottom-k within its own part), so merging partial sketches is
  dedup + re-rank — no lossy register max.

Estimator: with h uniform on [0, H) (H = 16^13 = 2^52 here, 13 md5 hex
nibbles — exact in a BIGINT on both engines), the k-th smallest hash of n
distinct values sits near k/n * H, so ``n ≈ (k-1) * H / h_(k)`` (the
unbiased form).  We compute it as an integer ``((k-1) << 52) DIV kth`` —
associative, overflow-safe for k <= 1023, and therefore oracle-exact.
When a group holds fewer than k distinct values the sketch IS the set and
the count is exact.

Distributed shape:
- build = one distinct-aggregate shuffle on (group, hash) + one
  per-group window rank (the window key is the group, so parallelism is
  group-cardinality wide; k rows per group survive);
- merge  = union + the same dedup/re-rank over k-sized inputs — runs on
  sketch-sized data, independent of corpus size (same incremental pattern
  as HLL persistence and the CMS linear merge);
- estimate = a per-group max/count over <= k rows.

52-bit hash collisions collapse distinct values (one in ~4.5e15 per pair)
— the same accepted class as every md5-keyed operator in this repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

K = 64
HASH_HEX = 13          # 13 hex nibbles -> [0, 2^52), exact in a long
HASH_BITS = 4 * HASH_HEX


def kmv_hash(col) -> F.Column:
    """Uniform 52-bit integer hash — exact on both engines
    (DuckDB twin: ('0x' || substr(md5('kmv:' || v), 1, 13))::BIGINT)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit("kmv:"), col.cast("string"))), 1, HASH_HEX),
        16, 10,
    ).cast("long")


def _bottom_k(hashed: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashed.distinct()
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def kmv_build(df: DataFrame, col: str, group_cols: list[str],
              k: int = K) -> DataFrame:
    """Sketch (group..., rk, h): the k smallest distinct hashes per group."""
    hashed = (
        df.where(F.col(col).isNotNull())
        .select(*group_cols, kmv_hash(F.col(col)).alias("h"))
    )
    return _bottom_k(hashed, group_cols, k)


def kmv_merge(sketches: DataFrame, group_cols: list[str],
              k: int = K) -> DataFrame:
    """Union partial sketches (possibly re-keyed) back into one sketch per
    group: dedup + re-rank.  Exact: bottom-k(union) == bottom-k(concat of
    per-part bottom-k)."""
    return _bottom_k(sketches.select(*group_cols, "h"), group_cols, k)


def kmv_intersect_estimate(a: DataFrame, b: DataFrame,
                           group_cols: list[str], k: int = K) -> DataFrame:
    """Theta-sketch set intersection from two KMV sketches (per group):
    (group..., est_union, n_common, est_intersect).

    The union sketch's k-th value is the threshold theta; every sketch
    member below theta is a uniform sample of the union, so
    ``|A ∩ B| ≈ (common members under theta) * est_union / k`` — computed
    as an integer DIV.  When the union holds fewer than k distinct hashes
    the sketches ARE the sets and both numbers are exact.  All inputs are
    rank-exact bottom-k sets, so the estimate hash-verifies."""
    merged = _bottom_k(
        a.select(*group_cols, "h").unionByName(b.select(*group_cols, "h")),
        group_cols, k,
    )
    u = kmv_estimate(merged, group_cols, k).withColumnRenamed(
        "est_distinct", "est_union"
    )
    common = (
        a.select(*group_cols, "h")
        .join(b.select(*group_cols, "h"), [*group_cols, "h"])
        # only members under the union threshold are a fair union sample
        .join(merged.select(*group_cols, "h"), [*group_cols, "h"], "left_semi")
        .groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        u.join(common, group_cols, "left")
        .select(
            *group_cols,
            "est_union",
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            F.when(
                F.col("n_kept") < k,
                F.coalesce("n_common", F.lit(0)).cast("long"),
            )
            .otherwise(
                F.expr(f"(coalesce(n_common, 0) * est_union) DIV {k}")
            )
            .alias("est_intersect"),
        )
    )


def kmv_estimate(sketch: DataFrame, group_cols: list[str],
                 k: int = K) -> DataFrame:
    """(group..., n_kept, kth_hash, est_distinct).  n_kept < k means the
    sketch saw fewer than k distinct values and the count is exact;
    otherwise the integer unbiased estimate ((k-1) << 52) DIV kth."""
    scaled = (k - 1) << HASH_BITS
    return (
        sketch.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max("h").alias("kth_hash"),
        )
        .withColumn(
            "est_distinct",
            F.when(F.col("n_kept") < k, F.col("n_kept").cast("long"))
            .otherwise(F.expr(f"{scaled} DIV kth_hash")),
        )
    )
