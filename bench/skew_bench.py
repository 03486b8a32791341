"""Adversarial-skew benchmark (VERDICT r3 ask #3).

SURVEY.md §7 names the real skew units for a transcript corpus: ONE
giant conversation, and single 10-100 MB turns. This harness builds that
corpus deterministically, then measures mitigation OBSERVED (straggler
task-time spread from the Spark event log + the AQE plan marker), not just
configured:

* ``naive``     — extraction with no payload policy: each huge turn's bytes
  ride in ONE task (a row can't be split below the row boundary), so with
  4 MB scan splits the 64 MB turn is a ~16x straggler and the stage's wall
  time is that one task.
* ``mitigated`` — ``split_oversized_turns`` (64 KB chunk rows) + salted
  per-turn repartition (plans/extract_pipeline.py): the same bytes spread
  across all tasks; spread collapses toward 1 and wall follows total/cores.
* ``skewjoin`` / ``skewjoin_noaqe`` — turns (TEXT carried, so bytes are the
  skew) sort-merge-joined to per-conv stats on conv_id: the giant
  conversation is one hot shuffle partition. With AQE skew-join on (and the
  skew threshold sized to the corpus so the optimizer can see the skew —
  production keeps the 256 MB default because production partitions are
  GB-scale), ``OptimizeSkewedJoin`` splits the hot partition:
  ``skew=true`` appears in the executed plan and the join-stage spread
  drops vs the _noaqe twin.

Extraction is per-turn stateless, so the GIANT CONVERSATION is NOT an
extraction-skew hazard by construction (per-turn keys — the design point
extract_pipeline.py's salted repartition docstring makes); it IS the join
hazard. The huge turns are the extraction hazard. The first harness run
measured exactly the inverse design (32 MB splits swallowed 12 MB turns,
spread 1.04) — this version sizes turns vs splits so the hazard is real.

Each condition runs in its own subprocess (own JVM, own single-file JSON
event log); the parent reports the heaviest stage (by total task time) and
the straggler stage (the one containing the longest single task). Writes
BENCH/SKEW_BENCH.json + a BENCH/BASELINE.md section.
Usage: python bench/skew_bench.py [--cpus 8]
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

DATA = "/dev/shm/dex_skew_corpus_v2"
EVLOG_ROOT = "/dev/shm/dex_skew_evlog"

N_NORMAL_CONVS = 500
GIANT_TURNS = 200_000
HUGE_TURN_MB = [16, 32, 64]  # one single-row turn each


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

    # the giant conversation, generated IN-PLAN (no driver loop)
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
                F.repeat(
                    F.concat(F.lit("tok"), (F.col("id") % 97).cast("string"), F.lit(" ")),
                    12,
                ),
            ).alias("text"),
            F.lit(None).cast("string").alias("tool"),
            F.timestamp_seconds(1767225600 + F.col("id")).alias("ts"),
        )
    )
    # single-row huge turns of increasing size — the biggest is the straggler
    huge_rows = spark.createDataFrame(
        [(i, mb) for i, mb in enumerate(HUGE_TURN_MB)], "id long, mb int"
    )
    huge = huge_rows.select(
        F.concat(F.lit("conv_huge_"), F.col("id").cast("string")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.repeat(
            F.concat(F.lit("blob chunk "), F.col("id").cast("string"), F.lit(" data ")),
            (F.col("mb") * 1024 * 1024 / 18).cast("int"),
        ).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.timestamp_seconds(1767225600 + F.col("id")).alias("ts"),
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
        # plain single-file JSON log so the parent can parse it (Spark 4
        # defaults to a rolling zstd directory)
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
        "spark.sql.files.maxPartitionBytes": "4m",
    }
    if condition.startswith("skewjoin"):
        # size the skew knobs to the corpus so the optimizer can SEE the
        # skew: production keeps the 256 MB default because production
        # partitions are GB-scale; this corpus's hot partition is ~50 MB.
        # Broadcast must be off end-to-end or AQE converts the SMJ to a
        # runtime broadcast join (the small side is tiny) and the skewed
        # exchange never reaches OptimizeSkewedJoin — observed in the
        # first harness run (skew_marker false, 1-task join).
        conf["spark.sql.adaptive.advisoryPartitionSizeInBytes"] = "4m"
        # thresholds are on COMPRESSED map-output bytes — a hot partition of
        # 2M identical keys LZ4s away to almost nothing (second harness run:
        # skew invisible), so the corpus carries an incompressible payload
        # and the threshold is sized to the compressed hot partition
        conf["spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"] = "1m"
        conf["spark.sql.adaptive.skewJoin.skewedPartitionFactor"] = "2.0"
        conf["spark.sql.adaptive.forceOptimizeSkewedJoin"] = "true"
        conf["spark.sql.autoBroadcastJoinThreshold"] = "-1"
        conf["spark.sql.adaptive.autoBroadcastJoinThreshold"] = "-1"
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

    # warm-up spawns workers (NORMAL conversations only — "conv-" prefix;
    # the giant/huge rows use "conv_"); excluded from the clock AND from the
    # parent's task stats via timed_after_ms
    force(
        build_extract_df(
            df.filter(F.col("conv_id").startswith("conv-")).limit(20000)
        )
    )

    info = {"condition": condition, "timed_after_ms": int(time.time() * 1000)}
    t0 = time.monotonic()
    if condition == "naive":
        force(build_extract_df(df))
    elif condition == "mitigated":
        chunked = split_oversized_turns(df, max_chars=64 * 1024)
        # chunk_idx folds into the turn key so the salted repartition
        # spreads a split turn's chunks across tasks too
        chunked = chunked.withColumn(
            "turn_idx", F.col("turn_idx") * 10000 + F.col("chunk_idx")
        ).drop("chunk_idx")
        force(build_extract_df(chunked, partitions=4 * cpus))
    elif condition in ("skewjoin", "skewjoin_noaqe"):
        # row-count skew: amplify the giant conversation 15x in-plan (3M
        # rows on one join key — modeling a bigger conversation without
        # storing it). The md5 payload is INCOMPRESSIBLE and must survive
        # the join (the final agg maxes it), so the hot partition's
        # compressed shuffle bytes reflect its row count — Catalyst prunes
        # any value derivable below the exchange, and LZ4 erases
        # repetitive keys, both of which hid the skew in earlier runs.
        turns = df.select(
            "conv_id", "turn_idx", F.length("text").alias("n_chars")
        ).withColumn(
            "_rep",
            F.explode(
                F.when(
                    F.col("conv_id") == "conv_giant", F.sequence(F.lit(0), F.lit(14))
                ).otherwise(F.sequence(F.lit(0), F.lit(0)))
            ),
        ).withColumn(
            "payload",
            F.md5(F.concat_ws(":", "conv_id", "turn_idx", "_rep")),
        )
        # MATERIALIZED stats side (as a real pipeline joining a stats TABLE
        # would): OptimizeSkewedJoin only matches an SMJ whose children are
        # bare Sort<-ShuffleStage — an aggregate keyed on the join key
        # leaves a HashAggregate between them and the rule never fires
        # (verified: identical query, non-materialized stats -> skew=false;
        # localCheckpointed stats -> skew=true). See PLANS.md round-4 notes.
        conv_stats = turns.groupBy("conv_id").agg(
            F.count(F.lit(1)).alias("conv_turns"),
            F.sum("n_chars").alias("conv_chars"),
        ).localCheckpoint()
        joined = turns.hint("merge").join(conv_stats.hint("merge"), "conv_id")
        summary = joined.groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.max("payload").alias("mx"),
            F.sum(F.col("n_chars") / F.col("conv_chars")).alias("fracsum"),
        )
        # collect() reuses THIS DataFrame's QueryExecution, so the captured
        # plan is the executed adaptive plan (a write/noop action builds a
        # fresh QueryExecution whose plan never shows the AQE skew marker)
        rows = summary.collect()
        info["rows"] = int(rows[0]["n"])
        plan = summary._jdf.queryExecution().executedPlan().toString()
        info["skew_marker"] = "skew=true" in plan
    else:
        raise SystemExit(f"unknown condition {condition}")
    info["wall_sec"] = round(time.monotonic() - t0, 2)
    spark.stop()
    print(json.dumps(info))


def _stage_stats(durs: list[int], sid: int) -> dict:
    durs = sorted(durs)
    med = durs[len(durs) // 2]
    return {
        "stage_id": sid,
        "n_tasks": len(durs),
        "median_ms": med,
        "max_ms": durs[-1],
        "spread": round(durs[-1] / max(med, 1), 2),
    }


def task_stats(evdir: str, after_ms: int = 0) -> dict:
    """Heaviest stage (by total task time) + straggler stage (containing the
    longest single task) from the event log; tasks launched before
    ``after_ms`` (the warm-up) are excluded."""
    stages: dict[int, list[int]] = {}
    paths = [
        p
        for p in glob.glob(os.path.join(evdir, "**"), recursive=True)
        if os.path.isfile(p) and "appstatus" not in p
        and not p.endswith((".zstd", ".lz4", ".crc"))
    ]
    for path in paths:
        with open(path, errors="replace") as f:
            for line in f:
                if '"SparkListenerTaskEnd"' not in line:
                    continue
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                ti = ev.get("Task Info", {})
                if ti.get("Launch Time", 0) < after_ms:
                    continue
                dur = ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
                stages.setdefault(ev.get("Stage ID", -1), []).append(dur)
    if not stages:
        return {}
    heavy = max(stages.items(), key=lambda kv: sum(kv[1]))
    straggle = max(stages.items(), key=lambda kv: max(kv[1]))
    out = {"heaviest": _stage_stats(heavy[1], heavy[0])}
    if straggle[0] != heavy[0]:
        out["straggler"] = _stage_stats(straggle[1], straggle[0])
    return out


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
    res["tasks"] = task_stats(evdir, after_ms=res.get("timed_after_ms", 0))
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
            "huge_turn_mb": HUGE_TURN_MB,
        },
        "results": results,
    }
    with open(os.path.join(REPO, "BENCH", "SKEW_BENCH.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(
        json.dumps(
            {
                c: {
                    "wall_sec": r["wall_sec"],
                    "spread": (r["tasks"].get("straggler") or r["tasks"].get("heaviest", {})).get("spread"),
                    **({"skew_marker": r["skew_marker"]} if "skew_marker" in r else {}),
                }
                for c, r in results.items()
            }
        )
    )

    lines = [
        "",
        f"## Adversarial skew ({args.cpus} CPUs, pinned)",
        "",
        f"Measured {out['measured']} on a corpus with one {GIANT_TURNS:,}-turn "
        f"conversation and single-row turns of {HUGE_TURN_MB} MB over "
        f"{N_NORMAL_CONVS} normal conversations (`python bench/skew_bench.py`; "
        "4 MB scan splits so a 64 MB row is a real outlier). Spread = "
        "max/median task time; straggler stage = the stage containing the "
        "longest single task (event log).",
        "",
        "| Condition | wall (s) | stage | tasks | median task (ms) | max task (ms) | spread |",
        "|---|---|---|---|---|---|---|",
    ]
    for c in conditions:
        r = results[c]
        for label in ("heaviest", "straggler"):
            t = (r.get("tasks") or {}).get(label)
            if not t:
                continue
            lines.append(
                f"| {c} ({label}) | {r['wall_sec']} | {t['stage_id']} | "
                f"{t['n_tasks']} | {t['median_ms']} | {t['max_ms']} | {t['spread']} |"
            )
    if "skew_marker" in results.get("skewjoin", {}):
        lines.append(
            f"\nAQE skew-join marker in executed plan (`skew=true`): "
            f"skewjoin={results['skewjoin']['skew_marker']}, "
            f"noaqe={results['skewjoin_noaqe'].get('skew_marker')}."
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
