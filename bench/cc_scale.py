"""Connected-components head-to-head at the 40x pair graph (VERDICT r4
ask #7): min-label propagation (O(diameter) rounds) vs large-star/small-star
contraction (O(log n) rounds, Kiveris et al. SoCC'14) on the REAL LSH pair
graph of the 40x replica-prefixed corpus — the round-4 comparison ran at 10x
(4,770 nodes); this rerun sizes the graph where the round-count story
matters.

Protocol: build the 40x corpus (bench/dedup_scale.py replication — replica
token prefixes keep per-replica near-dup structure exact), materialize the
candidate pair graph ONCE (localCheckpoint), then time each algorithm over
the same checkpointed edges, recording rounds (stats out-param) and labels
equality. Pinned CPUs like the other scaling harnesses.

Writes BENCH/CC_SCALE.json.

Usage: [taskset -c 0-7] python bench/cc_scale.py [--factor 40] [--cpus 8]
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=40)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--threshold", type=float, default=0.2)
    args = ap.parse_args()

    from bench.dedup_scale import build_corpus
    from document_extraction_spark import get_spark
    from document_extraction_spark.operators import dedup as DD

    sf_dir = build_corpus(args.src, args.factor)
    spark = get_spark(
        "cc_scale",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(2 * args.cpus, 16),
        extra_conf={
            "spark.local.dir": "/dev/shm/dex_spark_local",
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = DD.near_dup_pairs_pipeline(docs, threshold=args.threshold).localCheckpoint()
    n_pairs = pairs.count()

    def run(fn, max_iters):
        st: dict = {}
        t0 = time.monotonic()
        out = fn(pairs, max_iters=max_iters, stats=st).localCheckpoint()
        n_nodes = out.count()  # forces the full label computation
        sec = round(time.monotonic() - t0, 3)
        return out, {"sec": sec, "rounds": st.get("rounds"), "n_nodes": n_nodes}

    prop_df, prop = run(DD.dedup_clusters, 20)
    star_df, star = run(DD.dedup_clusters_star, 30)
    labels_equal = (
        prop_df.exceptAll(star_df).limit(1).count() == 0
        and star_df.exceptAll(prop_df).limit(1).count() == 0
    )

    result = {
        "measured": dt.datetime.now(dt.timezone.utc).isoformat(timespec="seconds"),
        "factor": args.factor,
        "cpus": args.cpus,
        "n_pairs": n_pairs,
        "propagation": prop,
        "star": star,
        "labels_equal": labels_equal,
    }
    with open(os.path.join(REPO, "BENCH", "CC_SCALE.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
