"""Classifier-evaluation metrics (operators/eval_metrics.py) against
hand-computed values on a fixed confusion structure.

gold/pred pairs (9 rows):
  a->a x3, a->b x1   (gold a: 4)
  b->b x2, b->a x1   (gold b: 3)
  c->a x2            (gold c: 2; class c never predicted)
pred margins: a=6, b=3; tp: a=3, b=2, c=0
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_extraction_spark.operators.eval_metrics import (
    confusion_matrix, kappa, per_class_prf,
)

PAIRS = (
    [("a", "a")] * 3 + [("a", "b")] + [("b", "b")] * 2 + [("b", "a")]
    + [("c", "a")] * 2
)


@pytest.fixture(scope="module")
def cm(spark):
    df = spark.createDataFrame(PAIRS, "gold string, pred string")
    return confusion_matrix(df, "gold", "pred")


def test_confusion_counts(cm):
    got = {(r["gold"], r["pred"]): r["n"] for r in cm.collect()}
    assert got == {("a", "a"): 3, ("a", "b"): 1, ("b", "b"): 2,
                   ("b", "a"): 1, ("c", "a"): 2}


def test_per_class_prf_hand_values(cm):
    rows = {r["label"]: r for r in per_class_prf(cm).collect()}
    a, b, c = rows["a"], rows["b"], rows["c"]
    assert (a["gold_n"], a["pred_n"], a["tp"]) == (4, 6, 3)
    assert a["precision"] == 0.5 and a["recall"] == 0.75
    assert a["f1"] == 0.6  # 2*.5*.75/1.25
    assert b["precision"] == round(2 / 3, 6) and b["recall"] == round(2 / 3, 6)
    # class c: never predicted -> precision 0 by convention, recall 0, f1 0
    assert (c["pred_n"], c["precision"], c["recall"], c["f1"]) == (0, 0.0, 0.0, 0.0)


def test_kappa_hand_value(cm):
    # po = 5/9; pe = (4*6 + 3*3 + 2*0)/81 = 33/81
    po, pe = 5 / 9, 33 / 81
    row = kappa(cm).collect()[0]
    assert row["n_total"] == 9
    assert row["accuracy"] == round(po, 6)
    assert row["kappa"] == round((po - pe) / (1 - pe), 6)


def test_reliability_bins_hand_values(spark):
    from decimal import Decimal

    from document_extraction_spark.operators.eval_metrics import (
        reliability_bins,
    )

    rows = (
        # bin 0 (scores .0x): 2 rows, 1 positive -> conf .05, acc .5
        [(Decimal("0.04"), True), (Decimal("0.06"), False)]
        # bin 9 via clamp (score 1.0) + a .95: 2 rows, both positive
        + [(Decimal("1.00"), True), (Decimal("0.95"), True)]
    )
    df = spark.createDataFrame(rows, "s decimal(18,4), y boolean")
    got = {r["bin"]: r for r in reliability_bins(df, "s", "y").collect()}
    assert set(got) == {0, 9}
    b0, b9 = got[0], got[9]
    assert b0["n"] == 2 and b0["conf"] == 0.05 and b0["acc"] == 0.5
    assert float(b0["gap_term"]) == 0.9  # |0.5 - 0.05| * 2
    assert b9["n"] == 2 and b9["conf"] == 0.975 and b9["acc"] == 1.0
    assert float(b9["gap_term"]) == 0.05


def test_kappa_degenerate_full_agreement_single_class(spark):
    df = spark.createDataFrame([("x", "x")] * 5, "gold string, pred string")
    row = kappa(confusion_matrix(df, "gold", "pred")).collect()[0]
    # pe == 1 (one class only): kappa pinned to 1.0, not 0/0
    assert row["accuracy"] == 1.0 and row["kappa"] == 1.0


def test_perfect_two_class_agreement(spark):
    df = spark.createDataFrame(
        [("x", "x")] * 3 + [("y", "y")] * 2, "gold string, pred string"
    )
    row = kappa(confusion_matrix(df, "gold", "pred")).collect()[0]
    assert row["kappa"] == 1.0
