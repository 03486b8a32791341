"""Transcript structural QC: per-conversation integrity checks over the
north-rule input shape (conv_id, turn_idx, role, text, tool, ts) — the
validation pass a 10^12-turn ingest runs BEFORE extraction, so malformed
conversations are quarantined instead of silently producing garbage turns
downstream (the reference CLI trusts its single input file; a web-scale
pipeline cannot).

Checks (all computed in ONE window pass + ONE groupBy, both keyed on
conv_id — two shuffles on the same key, AQE reuses the exchange):
- ``n_turns``            turns in the conversation
- ``gap_turns``          turn_idx not contiguous from 0 (re-delivery /
                         partial-write symptom)
- ``dup_turns``          duplicate turn_idx values (at-least-once symptom)
- ``same_role_runs``     consecutive user/assistant turns with the same role
                         (alternation breaks; tool/system turns exempt)
- ``untagged_tool_turns``  role='tool' rows with a NULL tool column
- ``ts_regressions``     timestamp strictly decreasing vs previous turn
- ``empty_turns``        whitespace-only or NULL text
- ``qc_ok``              conversation passes every check

Output is per-conversation (|convs| rows, not |turns|), so the QC table is
cheap to persist alongside the per-partition lineage metrics
(plans/extract_pipeline.py) and to diff across ingest runs via
operators/cdc.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transcript_qc(turns: DataFrame) -> DataFrame:
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    marked = turns.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        "ts",
        # rlike, not trim(): Spark trim strips only 0x20 spaces, so a
        # newline-only turn would otherwise pass as non-empty
        F.when(F.col("text").isNull() | F.col("text").rlike(r"^\s*$"), 1)
        .otherwise(0)
        .alias("is_empty"),
    ).select(
        "*",
        F.lag("turn_idx").over(w).alias("_prev_idx"),
        F.lag("role").over(w).alias("_prev_role"),
        F.lag("ts").over(w).alias("_prev_ts"),
    )
    ua = F.col("role").isin("user", "assistant")
    prev_ua = F.col("_prev_role").isin("user", "assistant")
    per_turn = marked.select(
        "conv_id",
        "turn_idx",
        "is_empty",
        F.when(
            F.col("_prev_idx").isNotNull()
            & (F.col("turn_idx") > F.col("_prev_idx") + 1),
            1,
        )
        .when(F.col("_prev_idx").isNull() & (F.col("turn_idx") != 0), 1)
        .otherwise(0)
        .alias("gap"),
        F.when(F.col("turn_idx") == F.col("_prev_idx"), 1).otherwise(0).alias("dup"),
        F.when(ua & prev_ua & (F.col("role") == F.col("_prev_role")), 1)
        .otherwise(0)
        .alias("same_role"),
        F.when((F.col("role") == "tool") & F.col("tool").isNull(), 1)
        .otherwise(0)
        .alias("untagged_tool"),
        F.when(
            F.col("_prev_ts").isNotNull() & (F.col("ts") < F.col("_prev_ts")), 1
        )
        .otherwise(0)
        .alias("ts_regress"),
    )
    agg = per_turn.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("gap").alias("gap_turns"),
        F.sum("dup").alias("dup_turns"),
        F.sum("same_role").alias("same_role_runs"),
        F.sum("untagged_tool").alias("untagged_tool_turns"),
        F.sum("ts_regress").alias("ts_regressions"),
        F.sum("is_empty").alias("empty_turns"),
    )
    bad = (
        F.col("gap_turns")
        + F.col("dup_turns")
        + F.col("same_role_runs")
        + F.col("untagged_tool_turns")
        + F.col("ts_regressions")
        + F.col("empty_turns")
    )
    return agg.withColumn("qc_ok", bad == 0)
