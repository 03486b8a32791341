"""Streaming throughput + state-store evidence (VERDICT r4 ask #8).

Measures, on a deterministic synthetic transcript corpus staged as many
parquet files on tmpfs:

* extraction-stream throughput across a ``maxFilesPerTrigger`` sweep — the
  knob that sizes micro-batches (small batches = low latency + scheduling
  overhead per row; large batches = amortized overhead, the backfill mode);
* state-store metrics (rows kept, memory) for each stateful operator class:
  session windows, stream-stream range join, watermark dedup — read from
  ``StreamingQuery.recentProgress`` (the same numbers a production monitor
  alerts on).

State growth bounds at 10^12-turn scale (see PLANS.md for the narrative):
every stateful query here carries a watermark, so state is O(key cardinality
within the watermark horizon), NOT O(stream length): sessions keep one open
window per active conversation, the join keeps both sides' rows younger than
the watermark, dedup keeps one key per (conv_id, turn_idx) in horizon.

Usage: python bench/stream_bench.py  -> writes BENCH/STREAM.json and prints
one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
N_CONVS = int(os.environ.get("STREAM_BENCH_CONVS", "4000"))
SEED = 7


def _drain(q) -> list:
    q.awaitTermination()
    return q.recentProgress


def _state_metrics(progress: list) -> dict:
    rows_total = mem = 0
    for p in progress:
        for op in p.get("stateOperators", []) or []:
            rows_total = max(rows_total, op.get("numRowsTotal", 0))
            mem = max(mem, op.get("memoryUsedBytes", 0))
    return {"state_rows_max": rows_total, "state_bytes_max": mem}


def main() -> int:
    from document_extraction_spark import get_spark
    from document_extraction_spark.sources.transcripts import write_transcripts_parquet
    from document_extraction_spark.streaming import extract_stream as ES

    data_root = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    src = os.path.join(data_root, f"dex_stream_bench_{N_CONVS}_{SEED}")
    if not os.path.exists(os.path.join(src, "_DONE")):
        # many small files: the unit of streaming ingest is the file
        n = write_transcripts_parquet(src, n_convs=N_CONVS, seed=SEED, rows_per_file=2_000)
        with open(os.path.join(src, "_DONE"), "w") as f:
            f.write(str(n))
    n_rows = int(open(os.path.join(src, "_DONE")).read())
    n_files = len([f for f in os.listdir(src) if f.endswith(".parquet")])

    spark = get_spark(
        "stream-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.local.dir": "/dev/shm/dex_spark_local"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(dir=data_root)
    results: dict = {"n_rows": n_rows, "n_files": n_files, "cpus": CPUS}

    # --- extraction throughput: maxFilesPerTrigger sweep -------------------
    sweep = []
    for mfpt in (1, 4, 16):
        dst = f"{work}/x_{mfpt}"
        ckpt = f"{work}/ck_{mfpt}"
        t0 = time.time()
        q = (
            ES.extract_stream(ES.read_transcript_stream(spark, src, mfpt))
            .writeStream.format("parquet")
            .option("path", dst)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        progress = _drain(q)
        sec = round(time.time() - t0, 3)
        out_rows = spark.read.parquet(dst).count()
        assert out_rows == n_rows, (out_rows, n_rows)
        sweep.append(
            {
                "max_files_per_trigger": mfpt,
                "n_batches": len(progress),
                "sec": sec,
                "rows_per_sec": round(n_rows / sec, 1),
            }
        )
    results["extract_sweep"] = sweep

    def run_stateful(name: str, sdf, complete: bool = False):
        t0 = time.time()
        q = (
            sdf.writeStream.format("noop")
            .option("checkpointLocation", f"{work}/ck_{name}")
            .outputMode("complete" if complete else "append")
            .trigger(availableNow=True)
            .start()
        )
        progress = _drain(q)
        sec = round(time.time() - t0, 3)
        m = _state_metrics(progress)
        m.update({"sec": sec, "rows_per_sec": round(n_rows / sec, 1),
                  "n_batches": len(progress)})
        return m

    stream = ES.read_transcript_stream(spark, src, 8)
    results["sessions"] = run_stateful(
        "sess", ES.conversation_sessions(stream), complete=False
    )
    results["join"] = run_stateful(
        "join",
        ES.tool_response_join(
            ES.read_transcript_stream(spark, src, 8),
            ES.read_transcript_stream(spark, src, 8),
        ),
    )
    results["dedup"] = run_stateful("dedup", ES.dedup_stream(stream))

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "BENCH", "STREAM.json"
    )
    with open(os.path.abspath(out_path), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
