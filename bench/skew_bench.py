"""Adversarial-skew benchmark (VERDICT r3 ask #3).

SURVEY.md §7 names the real skew units for a transcript corpus: ONE
million-turn conversation, and single >=10 MB turns. This harness builds
exactly that corpus deterministically, runs extraction + a conv-keyed join
under three conditions, and records the straggler task-time spread from the
Spark event log — mitigation OBSERVED, not just configured:

* ``naive``    — extraction with no repartition: the giant conversation's
  rows sit contiguous in few input splits and each 12 MB turn lands whole in
  one task; task-time spread shows the stragglers.
* ``mitigated`` — ``split_oversized_turns`` (12 MB turns -> 64 KB chunk
  rows) + salted per-turn repartition (plans/extract_pipeline.py): the same
  rows spread evenly; spread should collapse toward 1.
* ``skewjoin`` — turns joined to per-conv stats on conv_id (a 1M-row hot
  key) with broadcast disabled, AQE skew-join on: the post-run physical plan
  is scanned for the ``skew=...`` SMJ marker and the event log for split
  skew partitions. The paired ``skewjoin_noaqe`` run measures the same join
  with skew-splitting off.

Each condition runs in its own subprocess (own JVM, own event-log file);
the parent parses SparkListenerTaskEnd events of the heaviest stage for
max/median task time. Writes BENCH/SKEW_BENCH.json + a BENCH/BASELINE.md
section. Usage: python bench/skew_bench.py [--cpus 8]
"""

from __future__ import annotations

import argparse
import datetime as dt
import glob
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA = "/dev/shm/dex_skew_corpus"
EVLOG_ROOT = "/dev/shm/dex_skew_evlog"

N_NORMAL_CONVS = 1500
GIANT_TURNS = 1_000_000
N_HUGE_TURNS = 4
HUGE_TURN_MB = 12


def build_corpus() -> str:
    """Deterministic skewed transcripts table on tmpfs (cached)."""
    done = os.path.join(DATA, "_DONE")
    if os.path.exists(done):
        return DATA
    from document_extraction_spark import get_spark
    from document_extraction_spark.sources.transcripts import generate_transcripts_pdf
    from pyspark.sql import functions as F

    spark = get_spark("skew_corpus", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    normal = spark.createDataFrame(generate_transcripts_pdf(N_NORMAL_CONVS, seed=11))

    # the million-turn conversation, generated IN-PLAN (no driver loop):
    # ~120 chars/turn of deterministic per-turn text
    giant = (
        spark.range(GIANT_TURNS)
        .select(
            F.lit("conv_giant").alias("conv_id"),
            F.col("id").cast("int").alias("turn_idx"),
            F.when(F.col("id") % 2 == 0, "user").otherwise("assistant").alias("role"),
            F.concat(
                F.lit("turn payload segment "),
                F.col("id").cast("string"),
                F.lit(" :: "),
                F.repeat(F.concat(F.lit("tok"), (F.col("id") % 97).cast("string"), F.lit(" ")), 12),
            ).alias("text"),
            F.lit(None).cast("string").alias("tool"),
            F.timestamp_seconds(1767225600 + F.col("id")).alias("ts"),
        )
    )
    # a handful of >=10 MB single turns
    huge = (
        spark.range(N_HUGE_TURNS)
        .select(
            F.concat(F.lit("conv_huge_"), F.col("id").cast("string")).alias("conv_id"),
            F.lit(0).cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            F.repeat(
                F.concat(F.lit("blob chunk "), F.col("id").cast("string"), F.lit(" data ")),
                HUGE_TURN_MB * 1024 * 1024 // 18,
            ).alias("text"),
            F.lit(None).cast("string").alias("tool"),
            F.timestamp_seconds(1767225600 + F.col("id")).alias("ts"),
        )
    )
    normal.select("conv_id", "turn_idx", "role", "text", "tool", "ts").unionByName(
        giant
    ).unionByName(huge).write.mode("overwrite").parquet(DATA)
    spark.stop()
    with open(done, "w") as f:
        f.write("ok")
    return DATA


def child(condition: str, cpus: int, evdir: str) -> None:
    import time

    from document_extraction_spark import get_spark
    from document_extraction_spark.plans.extract_pipeline import (
        build_extract_df,
        split_oversized_turns,
    )
    from pyspark.sql import functions as F

    os.makedirs(evdir, exist_ok=True)
    conf = {
        "spark.local.dir": "/dev/shm/dex_spark_local",
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": f"file://{evdir}",
        "spark.sql.files.maxPartitionBytes": "32m",
    }
    if condition == "skewjoin_noaqe":
        conf["spark.sql.adaptive.skewJoin.enabled"] = "false"
    spark = get_spark(
        f"skew_{condition}",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        extra_conf=conf,
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(DATA)

    def force(d) -> None:
        d.write.format("noop").mode("overwrite").save()

    # warm-up spawns workers; excluded from the clock
    force(build_extract_df(df.filter(F.col("conv_id").startswith("c")).limit(20000)))

    info = {"condition": condition}
    t0 = time.monotonic()
    if condition == "naive":
        force(build_extract_df(df))
    elif condition == "mitigated":
        chunked = split_oversized_turns(df, max_chars=64 * 1024)
        # chunk_idx folds into the turn key so the salted repartition
        # spreads a split turn's chunks across tasks too
        chunked = chunked.withColumn(
            "turn_idx", F.col("turn_idx") * 1000 + F.col("chunk_idx")
        ).drop("chunk_idx")
        force(build_extract_df(chunked, partitions=8 * cpus))
    elif condition in ("skewjoin", "skewjoin_noaqe"):
        turns = df.select("conv_id", "turn_idx", F.length("text").alias("n_chars"))
        conv_stats = turns.groupBy("conv_id").agg(
            F.count(F.lit(1)).alias("conv_turns"), F.sum("n_chars").alias("conv_chars")
        )
        joined = turns.hint("merge").join(conv_stats.hint("merge"), "conv_id").select(
            "conv_id",
            "turn_idx",
            (F.col("n_chars") / F.col("conv_chars")).alias("frac"),
            "conv_turns",
        )
        force(joined)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        info["skew_marker"] = "skew=true" in plan
    else:
        raise SystemExit(f"unknown condition {condition}")
    info["wall_sec"] = round(time.monotonic() - t0, 2)
    spark.stop()
    print(json.dumps(info))


def task_stats(evdir: str) -> dict:
    """Max/median task duration of the heaviest stage in the event log."""
    stages: dict[int, list[int]] = {}
    for path in glob.glob(os.path.join(evdir, "*")):
        opener = open
        if path.endswith(".lz4"):
            continue
        with opener(path, errors="replace") as f:
            for line in f:
                if '"SparkListenerTaskEnd"' not in line:
                    continue
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                ti = ev.get("Task Info", {})
                dur = ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
                stages.setdefault(ev.get("Stage ID", -1), []).append(dur)
    if not stages:
        return {}
    heavy = max(stages.items(), key=lambda kv: sum(kv[1]))
    durs = sorted(heavy[1])
    med = durs[len(durs) // 2]
    return {
        "stage_id": heavy[0],
        "n_tasks": len(durs),
        "median_ms": med,
        "max_ms": durs[-1],
        "spread": round(durs[-1] / max(med, 1), 2),
    }


def run_child(condition: str, cpus: int) -> dict:
    evdir = os.path.join(EVLOG_ROOT, condition)
    shutil.rmtree(evdir, ignore_errors=True)
    cmd = [
        "taskset", "-c", f"0-{cpus - 1}", sys.executable, os.path.abspath(__file__),
        "--run-child", condition, "--cpus", str(cpus),
    ]
    print(f"[skew_bench] {' '.join(cmd)}", file=sys.stderr)
    out = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True, timeout=3600)
    if out.returncode != 0:
        print(out.stderr[-3000:], file=sys.stderr)
        raise SystemExit(f"child failed: {condition}")
    res = json.loads(out.stdout.strip().splitlines()[-1])
    res["tasks"] = task_stats(evdir)
    return res


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--run-child", default=None)
    args = ap.parse_args()
    if args.run_child:
        child(args.run_child, args.cpus, os.path.join(EVLOG_ROOT, args.run_child))
        return 0

    build_corpus()
    conditions = ["naive", "mitigated", "skewjoin", "skewjoin_noaqe"]
    results = {c: run_child(c, args.cpus) for c in conditions}
    out = {
        "measured": dt.datetime.now(dt.timezone.utc).isoformat(timespec="seconds"),
        "cpus": args.cpus,
        "corpus": {
            "normal_convs": N_NORMAL_CONVS,
            "giant_conv_turns": GIANT_TURNS,
            "huge_turns": N_HUGE_TURNS,
            "huge_turn_mb": HUGE_TURN_MB,
        },
        "results": results,
    }
    with open(os.path.join(REPO, "BENCH", "SKEW_BENCH.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({c: {"wall_sec": r["wall_sec"], **({"spread": r["tasks"].get("spread")} if r.get("tasks") else {})} for c, r in results.items()}))

    lines = [
        "",
        f"## Adversarial skew ({args.cpus} CPUs, pinned)",
        "",
        f"Measured {out['measured']} on a corpus with ONE {GIANT_TURNS:,}-turn "
        f"conversation and {N_HUGE_TURNS} single {HUGE_TURN_MB} MB turns over "
        f"{N_NORMAL_CONVS} normal conversations (`python bench/skew_bench.py`). "
        "Spread = max/median task time of the heaviest stage (event log).",
        "",
        "| Condition | wall (s) | tasks | median task (ms) | max task (ms) | spread |",
        "|---|---|---|---|---|---|",
    ]
    for c in conditions:
        r = results[c]
        t = r.get("tasks") or {}
        lines.append(
            f"| {c} | {r['wall_sec']} | {t.get('n_tasks', '—')} | "
            f"{t.get('median_ms', '—')} | {t.get('max_ms', '—')} | "
            f"{t.get('spread', '—')} |"
        )
    if "skew_marker" in results.get("skewjoin", {}):
        lines.append(
            f"\nAQE skew-join marker in executed plan (`skew=true`): "
            f"{results['skewjoin']['skew_marker']}; with skewJoin disabled: "
            f"{results['skewjoin_noaqe'].get('skew_marker')}."
        )
    md_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    md = open(md_path).read()
    marker = "## Adversarial skew"
    if marker in md:
        md = md[: md.index(marker)].rstrip() + "\n"
    with open(md_path, "w") as f:
        f.write(md.rstrip() + "\n" + "\n".join(lines) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
