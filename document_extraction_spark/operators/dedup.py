"""Deduplication operators for training-data pipelines.

All variants are expressed as declarative DataFrame plans (Catalyst handles
pushdown/broadcast/AQE); nothing collects to the driver.

Scale design (100 TB corpus):

* **exact**: hash-groupBy on an md5 fingerprint — the shuffle carries only
  (32-byte key, doc_id), never the payload.
* **MinHash + LSH**: shingle -> k min-hashes -> b bands -> candidate pairs
  join on band buckets. The band join is the only shuffle and its key space
  is the bucket hash; skewed buckets (stop-shingle pathologies) are handled
  by AQE skew-join splitting.
* **SimHash**: 32-bit signature from per-token hash bit votes; near-dups are
  candidates within hamming-ball buckets.
* **n-gram Jaccard**: exact verification of candidate pairs (or, at small
  scale, a direct shingle self-join).
* **embedding cosine**: near-dup pairs over an embedding column with
  blocking.

MinHash/LSH hashes use ``md5`` (engine-portable) so every variant has an
exact DuckDB oracle; at production scale ``xxhash64`` is a drop-in with the
same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from document_extraction_spark.functions.textstats import fingerprint

SHINGLE_WIDTH = 3
MINHASH_K = 8
LSH_BANDS = 4  # rows per band = MINHASH_K // LSH_BANDS = 2
SIMHASH_BITS = 32


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup via md5 fingerprint group; keeps the smallest id as the
    canonical representative. Returns (fingerprint, keep_id, n_dupes)."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
    )


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
             width: int = SHINGLE_WIDTH) -> DataFrame:
    """Distinct word-``width``-gram shingles per document (exploded)."""
    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    grams = F.when(
        n >= width,
        F.transform(
            F.sequence(F.lit(0), n - width),
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(width)]),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return (
        df.select(F.col(id_col).alias("doc_id"), F.array_distinct(grams).alias("sh"))
        .select("doc_id", F.explode("sh").alias("shingle"))
    )


def minhash_signatures(sh: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """k independent min-hashes per doc: h_i = min(md5(i || '|' || shingle)).

    Lexicographic min over md5 hex strings — portable across engines; the
    aggregation is a map-side-combinable groupBy (partial mins)."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"h{i}")
        for i in range(k)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(sig: DataFrame, k: int = MINHASH_K, bands: int = LSH_BANDS) -> DataFrame:
    """Band the signature, bucket-join, emit distinct candidate pairs (a<b)."""
    rows_per_band = k // bands
    band_cols = [
        F.md5(F.concat_ws("|", *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)])).alias(
            f"band{b}"
        )
        for b in range(bands)
    ]
    banded = sig.select("doc_id", *band_cols)
    buckets = banded.select(
        "doc_id",
        F.explode(F.array(*[
            F.concat_ws(":", F.lit(str(b)), F.col(f"band{b}")) for b in range(bands)
        ])).alias("bucket"),
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard_pairs(df: DataFrame, threshold: float = 0.6,
                        id_col: str = "doc_id", text_col: str = "text",
                        width: int = SHINGLE_WIDTH) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard >= threshold via shingle
    self-join (the verification step of the MinHash pipeline; also usable
    directly at moderate scale)."""
    sh = shingles(df, id_col, text_col, width)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_inter", "jaccard")
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = SIMHASH_BITS) -> DataFrame:
    """SimHash signature: per-token 60-bit md5 hash, per-bit +-1 votes,
    signature bit b set iff the vote is positive. Width configurable
    (32 here keeps the oracle SQL tractable; 64 at production)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != "")
        ).alias("tok"),
    )
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    votes = toks.select("doc_id", h.alias("h")).groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(bits)
        ]
    )
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"v{b}") > 0, F.lit(2 ** b).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return votes.select("doc_id", sig.alias("simhash"))
