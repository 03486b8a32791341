"""Data-layout clustering: Z-order (Morton) interleave for multi-dim scan
pruning.

At 100 TB the cheapest query is the one that never reads the file: parquet
scans skip whole files/row-groups whose footer min/max statistics exclude
the predicate. A 1-d sort gives that skipping for ONE column; bit-interleaving
the quantized values of two (or more) columns into a single Z-value and
range-partitioning + sorting on it gives every file a compact hyper-rectangle
in ALL interleaved dimensions — box predicates on any subset of them prune
(the layout trick behind Delta/Iceberg OPTIMIZE ZORDER; Morton 1966).

Everything here is pure Column expressions (shift/and/or — whole-stage
codegen); the only movement is the final range-exchange of the write.

Quantization contract: callers pass explicit (min, max) bounds per column
(production: table stats). Values are scaled to ``2^bits - 1`` with exact
double arithmetic — inputs are integers (or epoch seconds) well under 2^53,
so the scaled products are exact and ``floor`` is engine-stable (same
expression replicated in the DuckDB oracle twin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16


def quantize(col: Column, lo: Column | float, hi: Column | float,
             bits: int = ZBITS) -> Column:
    """Scale col from [lo, hi] to integer [0, 2^bits - 1], clamped."""
    lo_c = lo if isinstance(lo, Column) else F.lit(float(lo))
    hi_c = hi if isinstance(hi, Column) else F.lit(float(hi))
    top = (1 << bits) - 1
    q = F.floor(
        (col.cast("double") - lo_c) * F.lit(float(top)) / (hi_c - lo_c)
    ).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(top), q))


def z_interleave(qx: Column, qy: Column, bits: int = ZBITS) -> Column:
    """Morton-interleave two ``bits``-bit integers: x bits land at odd
    positions, y at even. Disjoint bit positions, so plain sum composes."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(qx, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        terms.append(F.shiftleft(F.shiftright(qy, i).bitwiseAND(F.lit(1)), 2 * i))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def zorder_df(df: DataFrame, x: str, y: str,
              x_bounds: tuple[float, float], y_bounds: tuple[float, float],
              bits: int = ZBITS) -> DataFrame:
    """df plus qx/qy/zval columns (no movement — pure projection)."""
    return (
        df.withColumn("qx", quantize(F.col(x), *x_bounds, bits=bits))
        .withColumn("qy", quantize(F.col(y), *y_bounds, bits=bits))
        .withColumn("zval", z_interleave(F.col("qx"), F.col("qy"), bits))
    )


def write_zordered(df: DataFrame, path: str, x: str, y: str,
                   x_bounds: tuple[float, float], y_bounds: tuple[float, float],
                   n_files: int, bits: int = ZBITS) -> None:
    """Range-partition on zval into ``n_files`` and sort within partitions —
    one exchange, each output file a compact Z-range (= a small tile in
    (x, y) space, so box predicates on either column skip most files)."""
    (
        zorder_df(df, x, y, x_bounds, y_bounds, bits)
        .repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
        .drop("qx", "qy", "zval")
        .write.mode("overwrite").parquet(path)
    )
