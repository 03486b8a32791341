"""Count-min sketch: fixed-size frequency estimation for heavy-hitter /
frequency queries over unbounded token streams (Cormode & Muthukrishnan 2005).

At 100 TB you cannot keep an exact (token, count) table hot — but a
``depth x width`` integer grid (here 4 x 1024 = 4k cells) answers
"how often did X occur" with one-sided error: estimates never undercount and
overcount by at most eps * total with probability 1 - delta.

Distributed shape:
- **Build** is one groupBy((row, bucket)) count over exploded tokens —
  map-side combinable, output bounded by depth*width regardless of corpus
  size.
- **Merge** across corpora/runs is a plain sum by (row, bucket) — sketches
  are linear, so incremental maintenance is a union + re-agg (same pattern
  as operators/sketch_state.py HLL persistence).
- **Probe** joins the tiny sketch (broadcast) against the probe set and takes
  min over rows.

Determinism: bucket = hexint13(md5("cms{row}:" || token)) mod width — exact
64-bit integer arithmetic reproduced verbatim by the DuckDB oracle twin, so
the full sketch AND every estimate are hash-verifiable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WIDTH = 1024
DEPTH = 4


def _bucket(col, row: int, width: int = WIDTH):
    """hexint13(md5('cms{row}:' || value)) % width — 13 hex nibbles < 2^52,
    exact in a long on both engines."""
    h = F.md5(F.concat(F.lit(f"cms{row}:"), col))
    return F.conv(F.substring(h, 1, 13), 16, 10).cast("long") % width


def cms_build(df: DataFrame, col: str, width: int = WIDTH,
              depth: int = DEPTH) -> DataFrame:
    """Sketch (row, bucket, cnt) from one value per input row.

    The stack of per-row bucket projections is a single map-only pass
    (posexplode of a literal array) followed by ONE count shuffle whose key
    space is depth*width — fixed size, no skew risk."""
    rows = F.array(*[
        F.struct(F.lit(r).alias("row"), _bucket(F.col(col), r, width).alias("bucket"))
        for r in range(depth)
    ])
    return (
        df.select(F.explode(rows).alias("rb"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Sketches are linear: merging = sum cell-wise."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(sketch: DataFrame, probes: DataFrame, col: str,
                 width: int = WIDTH, depth: int = DEPTH) -> DataFrame:
    """Estimated count per probe value: min over rows of the probed cells.

    The sketch is depth*width rows — broadcast; probes shuffle once for the
    final min-agg. Missing cells count as 0 (value never seen)."""
    pb = probes.select(
        F.col(col),
        F.explode(F.array(*[
            F.struct(F.lit(r).alias("row"), _bucket(F.col(col), r, width).alias("bucket"))
            for r in range(depth)
        ])).alias("rb"),
    ).select(col, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    return (
        pb.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt"))
    )


SQL_BUCKET = (
    "(list_sum([(strpos('0123456789abcdef', substr(md5('cms{r}:' || {c}), i, 1)) - 1)"
    " * power(16.0, 13 - i) for i in range(1, 14)])::BIGINT % {w})"
)
