"""Dedup-tail scaling at 10x data (VERDICT r3 ask #2).

The r3 per-query 2->8 scaling table measured the dedup tail
(q_minhash_lsh_pairs / q_lsh_jaccard_verified / q_near_dup_clusters) at
sf0.1 only — a regime where per-round driver synchronization and fixed job
overhead dominate, so the 0.35-0.38 efficiencies say nothing about the
100 TB claim. This harness re-measures the same three queries on a ~10x
documents table so per-round parallel work, not sync, is the denominator.

10x corpus construction (deterministic, no RNG): each replica k prefixes
every token of every document with ``r<k>`` — replicas keep the ORIGINAL
corpus's internal near-dup structure exactly (prefixing is a bijection on
shingle space) while sharing zero shingles across replicas, so pair count,
cluster count, and per-doc work all scale linearly by the factor. This is
the property a bigger corpus actually has (10x docs ~ 10x structure), unlike
naive replication, which turns every document into a 10-clique and inflates
pair volume 45x.

Protocol: same as bench/suite_scaling.py — whole process tree pinned with
``taskset -c 0-(N-1)``, interleaved paired runs (2,8,2,8) against this VM's
minutes-scale load drift, best-of-2 per (query, cpus), warm-up pass before
the clock. Writes BENCH/DEDUP_SCALE.json and appends a section to
BENCH/BASELINE.md.

Two small-scale artifacts must be neutralized or the measurement is of the
sandbox, not the plans (first harness run measured 0.23 "efficiency" with
IDENTICAL 2- and 8-CPU times — i.e. parallelism 1):

* the corpus must span MANY parquet row groups (``ROW_GROUP_SIZE`` in the
  COPY) — a 50k-row table written as DuckDB's default single row group is
  one unsplittable scan task no matter what maxPartitionBytes says;
* AQE's 64 MB ``advisoryPartitionSizeInBytes`` coalesces a ~20 MB shuffle
  to 1-2 partitions, serializing every post-shuffle stage. At 100 TB the
  blocks dwarf the advisory size so coalescing never goes below the core
  count; here the advisory size is dropped to 1 MB to emulate that regime.

Usage: python bench/dedup_scale.py [--factor 10] [--pair 2 8]
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = ["q_minhash_lsh_pairs", "q_lsh_jaccard_verified", "q_near_dup_clusters"]


def data_root() -> str:
    return "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"


def build_corpus(src_sf_dir: str, factor: int) -> str:
    """Replicate documents.parquet ``factor``x with per-replica token
    prefixes (see module docstring). Cached by (source, factor)."""
    import duckdb

    out = os.path.join(data_root(), f"dex_dedup10x_f{factor}_rg")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT d.doc_id + r.k * 1000000 AS doc_id,
                 CASE WHEN r.k = 0 THEN d.text
                      ELSE array_to_string(
                          list_transform(string_split(d.text, ' '),
                                         t -> 'r' || r.k || t), ' ')
                 END AS text,
                 d.source
          FROM read_parquet('{src_sf_dir}/documents.parquet') d
          CROSS JOIN (SELECT unnest(range({factor})) AS k) r
        ) TO '{out}/documents.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 2048)
        """
    )
    with open(done, "w") as f:
        f.write("ok")
    return out


def child(cpus: int, sf_dir: str) -> None:
    """Timed run of the three dedup queries at local[cpus]; prints JSON."""
    import time

    import __spark_entry__ as entry
    from document_extraction_spark import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(
        "dedup_scale",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 16),
        extra_conf={
            "spark.local.dir": "/dev/shm/dex_spark_local",
            "spark.sql.files.maxPartitionBytes": "2m",
            # emulate the 100 TB regime where shuffle blocks dwarf the
            # advisory size: without this, AQE coalesces the ~20 MB
            # exchanges to 1-2 partitions and serializes every stage
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warm-up: tiny pass through the composed pipeline spawns every core's
    # Python-free JVM codegen paths + the localCheckpoint machinery
    from document_extraction_spark.operators import dedup as DD

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    force(DD.near_dup_pairs_pipeline(docs.filter(F.col("doc_id") < 200), threshold=0.2))

    qs = entry.queries()
    times = {}
    for q in QUERIES:
        t0 = time.monotonic()
        force(qs[q](spark, sf_dir))
        times[q] = round(time.monotonic() - t0, 3)
    print(json.dumps(times))


def run_child(cpus: int, sf_dir: str) -> dict:
    cmd = [
        "taskset", "-c", f"0-{cpus - 1}", sys.executable, os.path.abspath(__file__),
        "--run-child", str(cpus), "--sf-dir", sf_dir,
    ]
    print(f"[dedup_scale] {' '.join(cmd)}", file=sys.stderr)
    out = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True, timeout=3600)
    if out.returncode != 0:
        print(out.stderr[-3000:], file=sys.stderr)
        raise SystemExit(f"child failed at {cpus} cpus")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--pair", nargs=2, type=int, default=[2, 8], metavar=("N", "MN"))
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--run-child", type=int, default=None)
    ap.add_argument("--sf-dir", default=None)
    args = ap.parse_args()

    if args.run_child is not None:
        child(args.run_child, args.sf_dir)
        return 0

    sf_dir = build_corpus(args.src, args.factor)
    n, mn = args.pair
    factor = mn / n
    # interleaved pairs: n, mn, n, mn — best-of-2 per side
    runs = {n: [], mn: []}
    for cpus in (n, mn, n, mn):
        runs[cpus].append(run_child(cpus, sf_dir))
    best = {
        c: {q: min(r[q] for r in rs) for q in QUERIES} for c, rs in runs.items()
    }
    per_query = {
        q: {
            f"sec@{n}": best[n][q],
            f"sec@{mn}": best[mn][q],
            "efficiency": round((best[n][q] / best[mn][q]) / factor, 3),
        }
        for q in QUERIES
    }
    tot_n = round(sum(best[n].values()), 3)
    tot_mn = round(sum(best[mn].values()), 3)
    result = {
        "measured": dt.datetime.now(dt.timezone.utc).isoformat(timespec="seconds"),
        "pair": [n, mn],
        "factor_10x_of": args.src,
        "replication": args.factor,
        "queries": per_query,
        "total": {
            f"sec@{n}": tot_n,
            f"sec@{mn}": tot_mn,
            "efficiency": round((tot_n / tot_mn) / factor, 3),
        },
        "all_runs": {str(c): rs for c, rs in runs.items()},
    }
    with open(os.path.join(REPO, "BENCH", "DEDUP_SCALE.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result["total"]))

    lines = [
        "",
        f"## Dedup tail at 10x data ({n} -> {mn} CPUs, pinned)",
        "",
        f"Measured {result['measured']} on a {args.factor}x replica-prefixed "
        f"{args.src} documents table (structure-preserving replication — see "
        "bench/dedup_scale.py docstring) via `python bench/dedup_scale.py`. "
        "Interleaved pairs, best-of-2, process tree taskset-pinned.",
        "",
        f"| Query | sec@{n} | sec@{mn} | efficiency |",
        "|---|---|---|---|",
    ]
    for q, row in per_query.items():
        lines.append(
            f"| {q} | {row[f'sec@{n}']} | {row[f'sec@{mn}']} | {row['efficiency']} |"
        )
    lines.append(
        f"| **total** | **{tot_n}** | **{tot_mn}** | "
        f"**{result['total']['efficiency']}** |"
    )
    md_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    md = open(md_path).read()
    marker = "## Dedup tail at 10x data"
    if marker in md:
        md = md[: md.index(marker)].rstrip() + "\n"
    with open(md_path, "w") as f:
        f.write(md.rstrip() + "\n" + "\n".join(lines) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
