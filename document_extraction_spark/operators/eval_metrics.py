"""Classifier evaluation over (gold, predicted) label pairs — the quality
gate a labeling/curation pipeline needs before trusting a model's labels at
scale: confusion matrix, per-class precision/recall/F1, micro accuracy, and
Cohen's kappa (chance-corrected agreement, the standard when two annotators
or a heuristic-vs-model pair label the same corpus).

Everything reduces to INTEGER pair counts (one groupBy(gold, pred) shuffle
whose key space is |classes|^2, independent of corpus size); the ratios
divide once in double and round at the edge — the repo's standard
engine-exactness recipe, so every metric value-hash-verifies.

Per-class definitions over the confusion counts n(g, p):
  tp(c) = n(c, c);   pred(c) = sum_g n(g, c);   gold(c) = sum_p n(c, p)
  precision = tp/pred, recall = tp/gold, f1 = 2pr/(p+r)   (0 when undefined)
Kappa: po = sum_c tp(c) / N,  pe = sum_c gold(c)*pred(c) / N^2,
  kappa = (po - pe) / (1 - pe)  — computed as ONE expression over the
  broadcast-sized class table so the double ops sequence identically on
  both engines.

Distributed shape: one |classes|^2-key groupBy; the per-class margins are a
second agg over that tiny table (broadcast-scale). Skew-free by
construction — the shuffle key space is bounded by the label vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_matrix(df: DataFrame, gold_col: str, pred_col: str) -> DataFrame:
    """(gold, pred, n) — the sufficient statistic every metric below reads."""
    return (
        df.select(F.col(gold_col).alias("gold"), F.col(pred_col).alias("pred"))
        .groupBy("gold", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def per_class_prf(cm: DataFrame, precision: int = 6) -> DataFrame:
    """(label, gold_n, pred_n, tp, precision, recall, f1) per class.

    A class appearing only as gold or only as pred still gets a row (full
    outer margin join); undefined ratios are 0.0 — the sklearn
    zero_division=0 convention."""
    gold_m = cm.groupBy(F.col("gold").alias("label")).agg(
        F.sum("n").alias("gold_n")
    )
    pred_m = cm.groupBy(F.col("pred").alias("label")).agg(
        F.sum("n").alias("pred_n")
    )
    tp = cm.where(F.col("gold") == F.col("pred")).select(
        F.col("gold").alias("label"), F.col("n").alias("tp")
    )
    base = (
        gold_m.join(pred_m, "label", "full_outer")
        .join(tp, "label", "left")
        .select(
            "label",
            F.coalesce("gold_n", F.lit(0)).alias("gold_n"),
            F.coalesce("pred_n", F.lit(0)).alias("pred_n"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
        )
    )
    p = F.when(F.col("pred_n") > 0,
               F.col("tp").cast("double") / F.col("pred_n")).otherwise(F.lit(0.0))
    r = F.when(F.col("gold_n") > 0,
               F.col("tp").cast("double") / F.col("gold_n")).otherwise(F.lit(0.0))
    return base.select(
        "label", "gold_n", "pred_n", "tp",
        F.round(p, precision).alias("precision"),
        F.round(r, precision).alias("recall"),
        F.round(
            F.when(p + r > 0, 2.0 * p * r / (p + r)).otherwise(F.lit(0.0)),
            precision,
        ).alias("f1"),
    )


def reliability_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    precision: int = 6,
) -> DataFrame:
    """Reliability-diagram bins for a [0,1]-scored binary classifier —
    the calibration check ("when it says 0.8, is it right 80% of the
    time?") that decides whether a quality scorer's threshold means
    anything.  FIXED-WIDTH bins (floor(score * n_bins), top edge clamped),
    not ntile: fixed-width is map-only with a <= n_bins-key groupBy —
    corpus-size-independent shuffle, no global sort — and it is the
    standard ECE binning (Guo et al. 2017).

    Returns (bin, n, conf, acc, gap_term): conf = mean score, acc =
    positive rate, both one double division over exact sums (pass the
    score as DECIMAL for an exact sum); gap_term = round(|acc - conf| *
    n, p) — pre-rounded per bin so the expected-calibration-error
    aggregation ``sum(gap_term) / N`` is order-free (the lm_score
    rounded-decimal-sum recipe)."""
    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    n = F.col("n").cast("double")
    conf = F.col("sum_score").cast("double") / n
    acc = F.col("n_pos").cast("double") / n
    return (
        df.select(
            b.alias("bin"),
            F.col(score_col).alias("s"),
            F.col(label_col).cast("int").alias("y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("s").alias("sum_score"),
            F.sum("y").alias("n_pos"),
        )
        .select(
            "bin",
            F.col("n").cast("long").alias("n"),
            F.round(conf, precision).alias("conf"),
            F.round(acc, precision).alias("acc"),
            F.round(F.abs(acc - conf) * n, precision)
            .cast(f"decimal(18,{precision})")
            .alias("gap_term"),
        )
    )


def kappa(cm: DataFrame, precision: int = 6) -> DataFrame:
    """One row: (n_total, accuracy, kappa) — micro accuracy (= observed
    agreement po) and Cohen's chance-corrected kappa."""
    margins = (
        per_class_prf(cm)
        .agg(
            F.sum("tp").alias("agree"),
            F.sum("gold_n").alias("n_total"),
            F.sum(F.col("gold_n").cast("double") * F.col("pred_n")).alias("gp"),
        )
    )
    po = F.col("agree").cast("double") / F.col("n_total")
    pe = F.col("gp") / (F.col("n_total").cast("double") * F.col("n_total"))
    return margins.select(
        F.col("n_total").cast("long").alias("n_total"),
        F.round(po, precision).alias("accuracy"),
        F.round(
            F.when(pe < 1.0, (po - pe) / (1.0 - pe)).otherwise(F.lit(1.0)),
            precision,
        ).alias("kappa"),
    )
