"""Z-order layout (operators/layout.py): curve math vs a pure-Python
reference, quantization clamping, and — the point of the operator — evidence
that the z-ordered write produces files whose per-file (x, y) bounding boxes
are compact tiles, so parquet min/max stats prune box predicates on EITHER
dimension (a plain 1-d sort only prunes one)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from document_extraction_spark.operators import layout as LY


def _py_interleave(x: int, y: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i + 1)
        out |= ((y >> i) & 1) << (2 * i)
    return out


def test_interleave_matches_python_reference(spark):
    rows = [(i, (i * 2654435761) % 65536, (i * 40503) % 65536) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = (
        df.withColumn("z", LY.z_interleave(F.col("x"), F.col("y")))
        .orderBy("id")
        .collect()
    )
    for r in got:
        assert r.z == _py_interleave(r.x, r.y), (r.id, r.x, r.y)


def test_interleave_locality_order(spark):
    # Monotone in each dim holding the other at 0; disjoint bit planes.
    df = spark.range(256).select(
        F.col("id"),
        LY.z_interleave(F.col("id"), F.lit(0)).alias("zx"),
        LY.z_interleave(F.lit(0), F.col("id")).alias("zy"),
    )
    rows = df.orderBy("id").collect()
    for a, b in zip(rows, rows[1:]):
        assert a.zx < b.zx and a.zy < b.zy
    # x lands on odd bits, y on even: composition is bit-disjoint.
    assert all(r.zx & r.zy == 0 for r in rows)


def test_quantize_bounds_and_clamp(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (50.0,), (100.0,), (250.0,)], "v double"
    )
    got = [
        r.q
        for r in df.select(
            LY.quantize(F.col("v"), 0.0, 100.0, bits=8).alias("q")
        ).collect()
    ]
    assert got == [0, 0, 127, 255, 255]  # floor(50*255/100)=127, clamped ends


def test_write_zordered_tiles_prune_both_dims(spark, tmp_path):
    # 64k points on a 256x256 grid, shuffled insert order.
    n = 1 << 16
    df = spark.range(n).select(
        ((F.col("id") * 48271) % n).alias("k")
    ).select(
        (F.col("k") % 256).alias("x"), (F.col("k") / 256).cast("long").alias("y")
    )
    out = str(tmp_path / "z")
    LY.write_zordered(df, out, "x", "y", (0, 255), (0, 255), n_files=16)

    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) >= 8
    boxes = []
    for f in files:
        t = pq.read_table(f)
        xs, ys = t.column("x").to_pylist(), t.column("y").to_pylist()
        boxes.append((min(xs), max(xs), min(ys), max(ys)))

    # Each file covers a fraction of BOTH dimension ranges (tiles, not
    # stripes): a point predicate on x alone or y alone skips files in BOTH
    # dims — a 1-d sort prunes one dim but leaves 100% survivors in the
    # other. Range-partition boundaries are sampled (seed shifts with
    # session history), so bound per-probe at 2/3 and the mean at 1/2
    # rather than the expected ~1/2 per probe exactly.
    def survivors(dim_lo, dim_hi, q):
        return sum(1 for b in boxes if b[dim_lo] <= q <= b[dim_hi])

    probes = [(d, q) for d in ((0, 1), (2, 3)) for q in (3, 100, 200)]
    counts = [survivors(*d, q) for d, q in probes]
    for (d, q), c in zip(probes, counts):
        assert c <= 2 * len(boxes) // 3, f"dim {d} probe {q}: {c}/{len(boxes)}"
    assert sum(counts) <= len(probes) * len(boxes) // 2, (counts, len(boxes))

    # And nothing was lost or duplicated.
    back = spark.read.parquet(out)
    assert back.count() == n
    assert back.select("x", "y").distinct().count() == n


@pytest.mark.parametrize("bits", [4, 8, 16])
def test_zval_range(spark, bits):
    top = (1 << bits) - 1
    df = spark.createDataFrame([(0, 0), (top, top)], "x long, y long")
    vals = [
        r.z
        for r in df.select(
            LY.z_interleave(F.col("x"), F.col("y"), bits=bits).alias("z")
        ).collect()
    ]
    assert vals[0] == 0 and vals[1] == (1 << (2 * bits)) - 1
