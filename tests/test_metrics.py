"""Metric parity against sklearn (the reference's metric backend)."""

import numpy as np
import pytest
from sklearn import metrics as skm

from fedvit_tpu.eval.metrics import (
    accuracy, auroc_ovr_macro, balanced_accuracy, classification_report,
    compute_metrics, confusion_matrix, macro_f1, per_class_recall,
)

NC = 8


@pytest.fixture
def preds():
    rng = np.random.default_rng(0)
    y_true = rng.integers(0, NC, size=500)
    y_pred = np.where(rng.uniform(size=500) < 0.6, y_true,
                      rng.integers(0, NC, size=500))
    probs = rng.dirichlet(np.ones(NC), size=500)
    # make probs informative
    probs[np.arange(500), y_true] += 0.5
    probs /= probs.sum(axis=1, keepdims=True)
    return y_true, y_pred, probs


def test_accuracy(preds):
    y, p, _ = preds
    assert abs(accuracy(y, p) - skm.accuracy_score(y, p)) < 1e-12


def test_balanced_accuracy(preds):
    y, p, _ = preds
    assert abs(balanced_accuracy(y, p, NC) - skm.balanced_accuracy_score(y, p)) < 1e-12


def test_macro_f1(preds):
    y, p, _ = preds
    ref = skm.f1_score(y, p, average="macro", zero_division=0)
    assert abs(macro_f1(y, p, NC) - ref) < 1e-12


def test_macro_f1_missing_classes():
    # class 7 never appears in truth or pred; class 6 only in pred
    y = np.array([0, 0, 1, 2, 3, 4, 5, 5])
    p = np.array([0, 1, 1, 2, 3, 4, 6, 5])
    ref = skm.f1_score(y, p, average="macro", zero_division=0)
    assert abs(macro_f1(y, p, NC) - ref) < 1e-12


def test_confusion_matrix(preds):
    y, p, _ = preds
    ref = skm.confusion_matrix(y, p, labels=list(range(NC)))
    assert (confusion_matrix(y, p, NC) == ref).all()


def test_per_class_recall(preds):
    y, p, _ = preds
    cm = confusion_matrix(y, p, NC)
    ref = skm.recall_score(y, p, average=None, zero_division=0, labels=list(range(NC)))
    assert np.allclose(per_class_recall(cm), ref)


def test_auroc(preds):
    y, _, probs = preds
    ref = skm.roc_auc_score(y, probs, multi_class="ovr", average="macro")
    assert abs(auroc_ovr_macro(y, probs) - ref) < 1e-10


def test_auroc_with_ties():
    y = np.array([0, 0, 1, 1, 1, 0])
    probs = np.array([[0.5, 0.5]] * 3 + [[0.2, 0.8]] * 3)
    ref = skm.roc_auc_score(y, probs[:, 1])
    assert abs(auroc_ovr_macro(y, probs) - ref) < 1e-12


def test_compute_metrics_dict(preds):
    y, p, probs = preds
    out = compute_metrics(y, p, NC, probs)
    for k in ("accuracy", "balanced_accuracy", "macro_f1",
              "confusion_matrix", "per_class_recall", "auroc"):
        assert k in out


def test_classification_report_runs(preds):
    y, p, _ = preds
    names = ["MEL", "NV", "BCC", "AK", "BKL", "DF", "VASC", "SCC"]
    rep = classification_report(y, p, names)
    assert "MEL" in rep and "macro avg" in rep
