"""Sequence packing: assemble documents into bounded token-budget bins
(context windows) — the step between a curated corpus and an LLM training
shard.

Packing is inherently sequential (a bin's contents depend on every earlier
document in its fill order), so the distributed form shards the corpus by a
deterministic key hash and packs each shard independently:

* shard assignment is a pure function of the id (first md5 hex nibbles), so
  re-runs and engines agree — and the oracle can replay it;
* within a shard, documents are packed in id order by GREEDY-WITH-RESET:
  each document after the first opens a new bin iff it would overflow the
  cap. A single oversized document occupies its own bin (never dropped,
  never split — splitting is `split_oversized_turns`' job upstream).

Scale: one shuffle on `shard`; per-shard work is O(corpus/shards) rows
through an Arrow-batched kernel. Shards are the parallelism knob — at
100 TB you run thousands of shards, each a few GB; packing quality is
unaffected because bins never span shards by design (a training shard is
itself a locality unit).  Deterministic: no RNG, no timestamps.

Reference parity: the reference CLI (/root/reference) emits one JSON per
document and has no packing stage; this operator extends the engine for
training-data assembly (SURVEY.md §2.4 training-pipeline rows).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HEX = "0123456789abcdef"


def shard_of(key_col, n_shards: int, mode: str = "hash"):
    """Deterministic shard in [0, n_shards) — a pure function of the id so
    re-runs, task retries, and engines agree.

    ``mode="hash"`` (default, the production path): ``pmod(xxhash64(id), n)``
    for ARBITRARY ``n_shards`` — at 100 TB you run thousands of shards, each
    a few GB, and this is the knob that gets you there.  xxhash64 is a
    JVM-side codegen'd expression, so shard assignment costs one hash per
    row, no Python.

    ``mode="md5"``: the original md5-hex-nibble assignment, restricted to
    n_shards in {16, 256} so the DuckDB oracle can replay it with plain
    strpos arithmetic (no hex->int cast, which is not portable across
    engines).  Kept exclusively for oracle-replayable queries
    (q_pack_context); everything else should take the default."""
    if mode == "hash":
        if n_shards < 1:
            raise ValueError(f"n_shards must be >= 1, got {n_shards}")
        return F.pmod(F.xxhash64(key_col.cast("string")), F.lit(n_shards)).cast("int")
    if mode != "md5":
        raise ValueError(f"mode must be 'hash' or 'md5', got {mode!r}")
    h = F.md5(key_col.cast("string"))

    def nib(i: int):
        # conv(hex-nibble, 16, 10); the DuckDB twin uses
        # strpos('0123456789abcdef', nibble) - 1 — same value, no hex cast
        return F.conv(F.substring(h, i, 1), 16, 10).cast("int")
    if n_shards == 16:
        return nib(1).cast("int")
    if n_shards == 256:
        return (nib(1) * 16 + nib(2)).cast("int")
    raise ValueError(
        f"n_shards must be 16 or 256 in md5 (oracle-portable) mode, got "
        f"{n_shards}; use mode='hash' for arbitrary shard counts"
    )


_PACK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("shard", T.IntegerType()),
        T.StructField("bin", T.LongType()),
        T.StructField("n_tok", T.LongType()),
    ]
)


def pack_documents(
    df: DataFrame,
    cap: int,
    n_shards: int = 16,
    id_col: str = "doc_id",
    tokens_col: str = "n_tok",
    shard_mode: str = "hash",
) -> DataFrame:
    """Assign every document a (shard, bin) so each bin's token total stays
    within ``cap`` (except single oversized documents, which sit alone).

    Input needs ``id_col`` (long) and ``tokens_col`` (long, precomputed —
    e.g. functions/textstats.token_count). Output: (doc_id, shard, bin,
    n_tok), one row per input document; bins are dense per shard, in id
    order.

    ``n_shards`` is the parallelism/memory knob: each shard's rows pass
    through one ``applyInPandas`` group, so per-shard row count must fit an
    executor — at production scale pick n_shards so corpus/n_shards is a few
    GB (thousands of shards), which the default ``shard_mode="hash"``
    (pmod(xxhash64)) supports for any count. ``shard_mode="md5"`` keeps the
    oracle-replayable {16, 256} assignment.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    prepared = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        shard_of(F.col(id_col), n_shards, mode=shard_mode).alias("shard"),
        F.col(tokens_col).cast("long").alias("n_tok"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins: list[int] = []
        b, fill = 0, 0
        for i, tok in enumerate(pdf["n_tok"]):
            t = int(tok) if tok is not None and not pd.isna(tok) else 0
            # greedy-with-reset: every row after the first opens a new bin
            # iff it would overflow (identical rule in the SQL oracle twin)
            if i > 0 and fill + t > cap:
                b += 1
                fill = 0
            fill += t
            bins.append(b)
        pdf["bin"] = pd.Series(bins, dtype="int64")
        return pdf[["doc_id", "shard", "bin", "n_tok"]]

    return prepared.groupBy("shard").applyInPandas(pack, schema=_PACK_SCHEMA)


def bin_stats(packed: DataFrame) -> DataFrame:
    """Per-(shard, bin) fill statistics: n_docs, total tokens. Utilization
    = bin_tokens / cap is the packing-quality metric to watch per corpus."""
    return packed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("bin_tokens"),
    )
