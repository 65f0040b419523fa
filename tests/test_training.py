"""Quantized logistic-regression training (operators/training.py).

The oracle-parity sweep (test_oracle_parity.py) already pins the full
train→score output bit-exactly against the unrolled DuckDB GD chain;
these tests cover the operator-level contracts that parity can't see:
the learned model must BEAT the majority-class baseline (i.e. training
actually learns, not just runs), the weight table must drop into the
serving path unchanged, and bad inputs must fail loudly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_transformation_python_spark.operators import text as tx
from data_transformation_python_spark.operators import training as tr
from data_transformation_python_spark.queries import load

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load(spark, SF_DIR, "documents")


def test_lr_train_beats_majority_baseline(docs):
    out = tr.lr_train_score(docs).collect()
    n = len(out)
    pos = sum(r["teacher_label"] for r in out)
    majority = max(pos, n - pos)
    agree = sum(1 for r in out if r["agree"])
    assert agree > majority, (agree, majority, n)
    # the balanced loss must actually recover positives, not just
    # ride the majority class
    true_pos = sum(
        1 for r in out if r["pred_label"] and r["teacher_label"] == 1
    )
    assert true_pos >= 0.9 * pos, (true_pos, pos)


def test_lr_weights_compose_with_serving_path(docs):
    W = tr.lr_train(docs, iters=3)
    weights = [W.get(b, 0) for b in range(1024)]
    served = tx.quality_classifier_serve(
        docs, weights, bias=W.get(-1, 0), n_buckets=1024
    )
    # serving recomputes z from raw text; it must equal the direct
    # count-based logit for every document
    direct = tr.lr_train_score(docs, iters=3).select("doc_id", "z_scaled")
    diff = (
        served.alias("s")
        .join(direct.alias("d"), "doc_id")
        .where(F.expr("s.z_scaled != d.z_scaled"))
        .count()
    )
    assert diff == 0


def test_serve_rejects_wrong_weight_count(docs):
    with pytest.raises(ValueError, match="weights"):
        tx.quality_classifier_serve(docs, [0] * 10, n_buckets=1024)


def test_lr_gopher_fit_pins_confusion_counts(docs):
    """Honest-target regime (text_lr_train_gopher): the fit of the
    Gopher verdict — NOT linearly representable (ratio thresholds) —
    must land on the exact measured confusion matrix at sf0.001
    (everything is fixed-point integer GD, so these counts are
    deterministic, not a statistical floor): acc 0.962 vs the 0.782
    majority baseline, with both classes genuinely predicted."""
    lbl, _ = tr.gopher_label_exprs()
    out = tr.lr_train_score(docs, label_expr=lbl)
    cm = {
        (r["pred_label"], r["true_label"]): r["count"]
        for r in out.groupBy("pred_label", "true_label").count().collect()
    }
    assert cm == {
        (False, 0): 104,
        (False, 1): 14,
        (True, 0): 5,
        (True, 1): 377,
    }, cm


def test_lr_symmetric_balance_beats_majority_on_majority_positive(docs):
    """The 78%-POSITIVE target is the regime the one-sided balance
    got wrong (it converged to all-positive = majority 0.782); the
    symmetric Kn multiplier must lift accuracy well above that."""
    lbl, _ = tr.gopher_label_exprs()
    out = tr.lr_train_score(docs, label_expr=lbl).collect()
    n = len(out)
    pos = sum(r["true_label"] for r in out)
    assert pos > n - pos  # the regime under test: positive majority
    acc = sum(1 for r in out if r["agree"]) / n
    assert acc >= 0.95, acc
    # and it actually rejects negatives instead of riding the class
    true_neg = sum(
        1 for r in out if not r["pred_label"] and r["true_label"] == 0
    )
    assert true_neg >= 0.9 * (n - pos), (true_neg, n - pos)


def test_lr_all_three_gradient_paths_identical(docs, monkeypatch):
    """Round 15 / r14 ADVICE (medium): the driver-local numpy loop,
    the mapInArrow partial-gradient path, and the JVM try_sum plan
    must learn IDENTICAL weight tables on the same corpus.  The
    fixture sits below both cutovers, so each path is forced
    explicitly: driver-local is the small-corpus default, Arrow is
    forced by zeroing _LR_DRIVER_MAX, and the JVM try_sum plan by the
    _LR_FORCE_JVM hook (the branch the loop takes whenever the int64
    bounds cannot be proven)."""
    w_driver = tr.lr_train(docs)

    monkeypatch.setattr(tr, "_LR_DRIVER_MAX", 0)
    w_arrow = tr.lr_train(docs)
    assert w_arrow == w_driver

    monkeypatch.setattr(tr, "_LR_FORCE_JVM", True)
    w_jvm = tr.lr_train(docs)
    assert w_jvm == w_driver
