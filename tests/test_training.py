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
