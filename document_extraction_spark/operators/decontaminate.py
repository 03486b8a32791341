"""Benchmark decontamination: flag corpus documents that share word n-grams
with an evaluation/benchmark set.

This is the standard pre-training hygiene pass (the reference pipeline has no
analogue — it is a per-document extractor; decontamination is one of the
"operations a large-scale training-data pipeline would need" the engine adds
on top): any training document containing an n-gram that also appears in a
held-out benchmark is flagged (and typically dropped or redacted) so the
benchmark stays uncontaminated.

Plan shape, and why it holds at 100 TB:

* Per-document n-grams are built **map-only** with higher-order array
  functions (``word_ngrams``: sequence -> transform -> slice), deduplicated
  per document with ``array_distinct`` BEFORE the explode — so the exploded
  gram stream carries each (doc, gram) once, never raw token positions.
* The benchmark side is tiny by construction (eval sets are MBs against a
  100 TB corpus), so its distinct-gram set is **broadcast**: the corpus-side
  stream is filtered by a broadcast hash semi-join — zero shuffle of corpus
  grams.
* The only shuffle is the final ``groupBy(doc_id)`` count over the *matched*
  grams — a vanishingly small fraction of the corpus — with map-side partial
  aggregation.
* If the benchmark is too big to broadcast (unusual), pass
  ``broadcast_benchmark=False`` to fall back to a shuffled semi-join; the
  gram key is high-cardinality and uniform, so no skew handling is needed.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from document_extraction_spark.functions.textstats import tokens, word_ngrams

# Python twin of the Java \s class behind textstats.tokens (Python re's \s
# would additionally match Unicode whitespace — see operators/dedup.py)
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _doc_grams(df: DataFrame, n: int, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, gram): each document's DISTINCT lowercase word n-grams.

    r7 Arrow kernel (guide §4.2): the tokens -> word_ngrams ->
    array_distinct -> explode chain ran as interpreted HOF expressions per
    document; the kernel builds the same distinct gram set with Python
    string ops.  Emits the identical row SET (NULL text and <n-token docs
    emit nothing, exactly like exploding the HOF's empty array); every
    consumer (distinct, semi-join, count) is row-order-free.  HOF twin kept
    below for the kernel-equality differential test."""
    from document_extraction_spark.session import ensure_worker_package

    ensure_worker_package(df.sparkSession)
    id_type = df.schema[id_col].dataType
    schema = T.StructType([
        T.StructField("doc_id", id_type),
        T.StructField("gram", T.StringType()),
    ])

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            ids: list = []
            grams: list[str] = []
            for doc_id, text in zip(pdf["_id"], pdf["_txt"]):
                if text is None:
                    continue
                toks = [t for t in _JAVA_WS.split(text.lower()) if t]
                if len(toks) < n:
                    continue
                gs = dict.fromkeys(
                    " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                )
                ids.extend([doc_id] * len(gs))
                grams.extend(gs)
            if ids:
                yield pd.DataFrame({"doc_id": ids, "gram": grams})

    return df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_txt")
    ).mapInPandas(kernel, schema=schema)


def _doc_grams_hof(df: DataFrame, n: int, id_col: str, text_col: str) -> DataFrame:
    """Pure-Column HOF twin of :func:`_doc_grams` (pre-r7 path) — the
    expression tree the DuckDB oracle mirrors; kernel equality pinned in
    tests/test_dedup_kernels.py."""
    toks = tokens(F.lower(F.col(text_col)))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(word_ngrams(toks, n))).alias("gram"),
    )


def contaminated_ngram_counts(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-corpus-document count of distinct word ``n``-grams shared with the
    benchmark set: ``(doc_id, n_shared)``, contaminated documents only.

    ``n_shared`` counts *distinct* shared grams (each gram counted once per
    document regardless of repetition), so the number is a stable
    contamination severity signal independent of document length.
    """
    bench_grams = _doc_grams(benchmark, n, id_col, text_col).select("gram").distinct()
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    corpus_grams = _doc_grams(corpus, n, id_col, text_col)
    return (
        corpus_grams.join(bench_grams, "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    max_shared: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop corpus documents sharing more than ``max_shared`` distinct
    ``n``-grams with the benchmark (default: any overlap drops the doc).
    Returns the surviving corpus rows with their original columns."""
    flagged = contaminated_ngram_counts(
        corpus, benchmark, n=n, id_col=id_col, text_col=text_col
    ).filter(F.col("n_shared") > max_shared)
    return corpus.join(
        flagged.withColumnRenamed("doc_id", id_col).select(id_col),
        id_col,
        "left_anti",
    )


def semantic_decontaminate(
    corpus_emb: DataFrame,
    eval_emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prefilter_planes: int | None = None,
    prefilter_bands: int = 8,
    dim: int = 64,
    seed: int = 1234,
) -> DataFrame:
    """Embedding-space decontamination: flag corpus rows whose max cosine
    similarity to ANY eval-set embedding reaches ``threshold`` — catches
    paraphrased/reworded benchmark leakage that n-gram overlap
    (:func:`decontaminate`) misses.

    Plan shape at 100 TB: the eval side is tiny by construction ->
    **broadcast** nested-loop against the corpus scan, cosine evaluated
    JVM-side (array HOFs, no Python), then ONE groupBy(doc) max — the same
    broadcast-small-side shape as the n-gram path, swapped into vector
    space. Corpus embeddings stream through; nothing collects.

    That broadcast-NLJ costs |corpus| x |eval| cosines. When the eval suite
    is large (hundreds of benchmarks), set ``prefilter_planes`` (VERDICT r4
    ask #5) to gate the cosine behind banded signed-random-projection
    bucketing (the :func:`similarity.srp_near_dup_pairs` scheme,
    ``prefilter_bands`` bands of ``prefilter_planes/prefilter_bands`` sign
    bits): a corpus row is scored only against eval vectors colliding in at
    least one band, shrinking the pair stream by the band collision rate.
    Banding bounds the miss probability at (1 - p^r)^b per true pair
    (p = 1 - acos(cos)/pi); at threshold 0.9 with 16 planes / 8 bands that
    is < 0.3%. The prefilter is approximate BY DESIGN: rows with no
    colliding eval vector report ``max_cos`` NULL and contaminated=false,
    so ``max_cos`` is a lower-bound witness, not an exact maximum.

    Output: (doc_id, max_cos, contaminated) for every corpus row, cosine
    rounded to 4 decimals at the edge (engine-stable). ``eval_emb`` must
    carry ``id_col`` too when the prefilter is on (candidate dedup across
    bands is keyed by it)."""
    from document_extraction_spark.operators.similarity import cosine

    c = corpus_emb.select(F.col(id_col).alias("doc_id"), F.col(vec_col).alias("cv"))
    if prefilter_planes is None:
        e = eval_emb.select(F.col(vec_col).alias("ev"))
        scored = c.join(F.broadcast(e)).select(
            "doc_id", cosine(F.col("cv"), F.col("ev")).alias("_cos")
        )
        return (
            scored.groupBy("doc_id")
            .agg((F.round(F.max("_cos"), 4) + F.lit(0.0)).alias("max_cos"))
            .select(
                "doc_id",
                "max_cos",
                (F.col("max_cos") >= threshold).alias("contaminated"),
            )
        )

    from document_extraction_spark.operators.similarity import (
        _checked_dim,
        _hyperplanes,
        srp_signature,
    )

    if prefilter_planes % prefilter_bands != 0:
        raise ValueError(
            f"prefilter_bands ({prefilter_bands}) must divide "
            f"prefilter_planes ({prefilter_planes})"
        )
    per_band = prefilter_planes // prefilter_bands
    planes = _hyperplanes(dim, prefilter_planes, seed)

    def banded(df: DataFrame, out_id: str, out_vec: str) -> DataFrame:
        vec_ok = _checked_dim(F.col(vec_col), dim)
        bands = F.array(
            *[
                F.concat_ws(
                    ":",
                    F.lit(str(b)),
                    srp_signature(
                        vec_ok, planes[b * per_band : (b + 1) * per_band]
                    ).cast("string"),
                )
                for b in range(prefilter_bands)
            ]
        )
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(out_vec),
            F.explode(bands).alias("bucket"),
        )

    cb = banded(corpus_emb, "doc_id", "cv")
    eb = banded(eval_emb, "eval_id", "ev")
    cand = cb.join(F.broadcast(eb), "bucket").dropDuplicates(["doc_id", "eval_id"])
    per_doc = (
        cand.select("doc_id", cosine(F.col("cv"), F.col("ev")).alias("_cos"))
        .groupBy("doc_id")
        .agg((F.round(F.max("_cos"), 4) + F.lit(0.0)).alias("max_cos"))
    )
    return (
        c.select("doc_id")
        .distinct()
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "max_cos",
            F.coalesce(F.col("max_cos") >= threshold, F.lit(False)).alias(
                "contaminated"
            ),
        )
    )


def semantic_decontaminate_arrow(
    corpus_emb: DataFrame,
    eval_emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_eval: int = 100_000,
) -> DataFrame:
    """EXACT semantic decontamination through an Arrow-batched matmul kernel
    — same output contract as :func:`semantic_decontaminate` (no prefilter),
    ~100x faster on the same pair count.

    Why: the broadcast-NLJ path evaluates the cosine with array higher-order
    functions, which Spark interprets per row OUTSIDE whole-stage codegen —
    measured ~10 us per pair (BENCH/DECON_SRP.json). This kernel collects
    the (small, would-be-broadcast) eval side to a dense float64 matrix that
    rides the ``mapInPandas`` closure, and each corpus Arrow batch computes
    max-cosine as ONE BLAS matmul: |corpus| x |eval| x dim flops at numpy
    speed, corpus never shuffles, nothing but (doc_id, max_cos) comes back.

    Numerics: same IEEE-double ops as the HOF path; the BLAS dot's summation
    ORDER differs, so the 4th-decimal rounding could in principle differ for
    a cosine within ~1e-15 of a 0.00005 boundary (never observed on the
    fixtures; pinned equal in tests/test_drift_sampling_ops.py)."""
    import numpy as np
    import pandas as pd

    from document_extraction_spark.session import ensure_worker_package

    ensure_worker_package(corpus_emb.sparkSession)

    ev_pd = eval_emb.select(vec_col).limit(max_eval + 1).toPandas()
    if len(ev_pd) > max_eval:
        raise ValueError(
            f"semantic_decontaminate_arrow holds the eval set in memory: more "
            f"than {max_eval} eval rows. Use the SRP prefilter path instead."
        )
    emat = np.stack(ev_pd[vec_col].to_numpy()).astype(np.float64)
    enorm = np.sqrt((emat * emat).sum(axis=1))

    def kernel(batches):
        for pdf in batches:
            cmat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cnorm = np.sqrt((cmat * cmat).sum(axis=1))
            sims = cmat @ emat.T
            denom = np.outer(cnorm, enorm)
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = sims / denom
            mx = np.nanmax(np.where(denom > 0, sims, np.nan), axis=1)
            yield pd.DataFrame({"doc_id": pdf[id_col].values, "_max": mx})

    scored = corpus_emb.select(id_col, vec_col).mapInPandas(
        kernel, schema="doc_id long, _max double"
    )
    return scored.select(
        "doc_id",
        (F.round("_max", 4) + F.lit(0.0)).alias("max_cos"),
    ).select(
        "doc_id", "max_cos", (F.col("max_cos") >= threshold).alias("contaminated")
    )
