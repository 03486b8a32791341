"""Read-side evidence for the Z-order layout (operators/layout.py): writes the
events table three ways — hash-shuffled baseline, 1-d ts sort, z-order
(user_id x ts) — then measures, per layout:

1. **Stat-based row-group pruning** (deterministic): fraction of parquet row
   groups whose footer min/max intersect each predicate. This is exactly the
   decision an engine makes at 100 TB from file/row-group stats (Iceberg
   file pruning, parquet predicate pushdown), measured directly from the
   footers with pyarrow — no reader heuristics in the way.
2. **Spark wall-clock** for the same filtered aggregate (best of 2).

Predicates: a user_id slice (1/16 of the id range), a ts slice (1/16 of the
time range), and their conjunction. Expectation: the 1-d sort prunes its own
dimension only; z-order prunes BOTH; the shuffled baseline prunes nothing.

Usage: python bench/zorder_skip.py  (env SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
Writes BENCH/ZORDER.json.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from document_extraction_spark import get_spark
from document_extraction_spark.operators import layout as LY

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("ZORDER_WORK", "/dev/shm/dex_zorder")
N_FILES = 48


def survivors(path: str, col_ranges: dict[str, tuple]) -> tuple[int, int]:
    """(surviving, total) row groups whose [min,max] intersect every range."""
    live = total = 0
    for f in sorted(glob.glob(path + "/part-*.parquet")):
        meta = pq.ParquetFile(f).metadata
        names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        for rg in range(meta.num_row_groups):
            total += 1
            ok = True
            for c, (lo, hi) in col_ranges.items():
                st = meta.row_group(rg).column(names[c]).statistics
                if st.min > hi or st.max < lo:
                    ok = False
                    break
            if ok:
                live += 1
    return live, total


def timed(df_fn, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        df_fn().collect()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main() -> None:
    spark = get_spark("zorder_skip")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(WORK, ignore_errors=True)

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", F.unix_timestamp("ts").alias("tsec"), "user_id", "value"
    )
    b = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("tsec"), F.max("tsec")
    ).collect()[0]
    u_lo, u_hi, t_lo, t_hi = b

    paths = {k: f"{WORK}/{k}" for k in ("shuffled", "sorted_ts", "zorder")}
    ev.repartition(N_FILES).write.mode("overwrite").parquet(paths["shuffled"])
    ev.repartitionByRange(N_FILES, "tsec").sortWithinPartitions("tsec") \
        .write.mode("overwrite").parquet(paths["sorted_ts"])
    LY.write_zordered(ev, paths["zorder"], "user_id", "tsec",
                      (u_lo, u_hi), (t_lo, t_hi), n_files=N_FILES)

    u_span, t_span = (u_hi - u_lo) / 16, (t_hi - t_lo) / 16
    u_box = (u_lo + 7 * u_span, u_lo + 8 * u_span)
    t_box = (t_lo + 7 * t_span, t_lo + 8 * t_span)
    preds = {
        "user_slice": {"user_id": u_box},
        "ts_slice": {"tsec": t_box},
        "both": {"user_id": u_box, "tsec": t_box},
    }

    out = {"sf_dir": SF_DIR, "n_files": N_FILES, "rows": ev.count(), "layouts": {}}
    for name, path in paths.items():
        lay = {"prune": {}, "wall_sec": {}}
        for pname, ranges in preds.items():
            live, total = survivors(path, ranges)
            lay["prune"][pname] = {"survive": live, "total": total,
                                   "frac": round(live / total, 3)}
            cond = None
            for c, (lo, hi) in ranges.items():
                cc = (F.col(c) >= lo) & (F.col(c) <= hi)
                cond = cc if cond is None else (cond & cc)
            df = spark.read.parquet(path)
            lay["wall_sec"][pname] = timed(
                lambda df=df, cond=cond: df.where(cond).agg(
                    F.count("*"), F.sum("value"))
            )
        out["layouts"][name] = lay

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/ZORDER.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
