"""Classification metrics — native numpy implementations.

The reference delegates to sklearn (accuracy / balanced-accuracy / macro-F1 /
confusion-matrix / classification-report; /root/reference/utils.py:268-280,
train.py:209-214). We implement the same math host-side in numpy (verified
against sklearn in tests/test_metrics.py) plus macro one-vs-rest AUROC for
the driver's north-star metric.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def confusion_matrix(y_true, y_pred, num_classes: int) -> np.ndarray:
    """(C, C) matrix; rows = true class, cols = predicted class."""
    y_true = np.asarray(y_true, dtype=np.int64)
    y_pred = np.asarray(y_pred, dtype=np.int64)
    cm = np.zeros((num_classes, num_classes), dtype=np.int64)
    np.add.at(cm, (y_true, y_pred), 1)
    return cm


def accuracy(y_true, y_pred) -> float:
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    return float((y_true == y_pred).mean()) if len(y_true) else 0.0


def per_class_recall(cm: np.ndarray) -> List[float]:
    """cm[i,i]/sum(cm[i]) with 0 for empty rows (reference utils.py:270)."""
    sums = cm.sum(axis=1)
    return [float(cm[i, i] / sums[i]) if sums[i] > 0 else 0.0
            for i in range(cm.shape[0])]


def balanced_accuracy(y_true, y_pred, num_classes: Optional[int] = None) -> float:
    """Mean recall over classes *present in y_true* (sklearn semantics)."""
    y_true = np.asarray(y_true, dtype=np.int64)
    if len(y_true) == 0:
        return 0.0
    nc = num_classes or int(max(y_true.max(), np.asarray(y_pred).max()) + 1)
    cm = confusion_matrix(y_true, y_pred, nc)
    sums = cm.sum(axis=1)
    present = sums > 0
    recalls = np.where(present, np.diag(cm) / np.maximum(sums, 1), 0.0)
    return float(recalls[present].mean()) if present.any() else 0.0


def macro_f1(y_true, y_pred, num_classes: Optional[int] = None) -> float:
    """Macro-averaged F1 with zero_division=0, averaged over classes present
    in y_true OR y_pred (sklearn `f1_score(average='macro')` semantics)."""
    y_true = np.asarray(y_true, dtype=np.int64)
    y_pred = np.asarray(y_pred, dtype=np.int64)
    if len(y_true) == 0:
        return 0.0
    nc = num_classes or int(max(y_true.max(), y_pred.max()) + 1)
    cm = confusion_matrix(y_true, y_pred, nc)
    tp = np.diag(cm).astype(np.float64)
    pred_tot = cm.sum(axis=0).astype(np.float64)
    true_tot = cm.sum(axis=1).astype(np.float64)
    prec = np.where(pred_tot > 0, tp / np.maximum(pred_tot, 1), 0.0)
    rec = np.where(true_tot > 0, tp / np.maximum(true_tot, 1), 0.0)
    denom = prec + rec
    f1 = np.where(denom > 0, 2 * prec * rec / np.maximum(denom, 1e-300), 0.0)
    present = (true_tot > 0) | (pred_tot > 0)
    return float(f1[present].mean()) if present.any() else 0.0


def _binary_auroc(y_true: np.ndarray, scores: np.ndarray) -> float:
    """AUROC via the Mann-Whitney U rank statistic (ties → midranks)."""
    n_pos = int(y_true.sum())
    n_neg = len(y_true) - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty(len(scores), dtype=np.float64)
    sorted_scores = scores[order]
    # midranks for ties
    i = 0
    while i < len(scores):
        j = i
        while j + 1 < len(scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        ranks[order[i:j + 1]] = 0.5 * (i + j) + 1.0
        i = j + 1
    r_pos = ranks[y_true.astype(bool)].sum()
    return float((r_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))


def auroc_ovr_macro(y_true, probs) -> float:
    """Macro one-vs-rest AUROC; classes absent from y_true are skipped."""
    y_true = np.asarray(y_true, dtype=np.int64)
    probs = np.asarray(probs, dtype=np.float64)
    aucs = []
    for c in range(probs.shape[1]):
        mask = (y_true == c).astype(np.float64)
        if 0 < mask.sum() < len(mask):
            aucs.append(_binary_auroc(mask, probs[:, c]))
    return float(np.mean(aucs)) if aucs else float("nan")


def compute_metrics(y_true, y_pred, num_classes: int,
                    probs: Optional[np.ndarray] = None) -> Dict:
    """Full metric dict matching reference `evaluate` (utils.py:271-280)."""
    cm = confusion_matrix(y_true, y_pred, num_classes)
    out = {
        "accuracy": accuracy(y_true, y_pred),
        "balanced_accuracy": balanced_accuracy(y_true, y_pred, num_classes),
        "macro_f1": macro_f1(y_true, y_pred, num_classes),
        "confusion_matrix": cm,
        "per_class_recall": per_class_recall(cm),
    }
    if probs is not None and len(np.asarray(y_true)):
        out["auroc"] = auroc_ovr_macro(y_true, probs)
    return out


def classification_report(y_true, y_pred, target_names: Sequence[str],
                          digits: int = 4) -> str:
    """Text report in the spirit of sklearn.classification_report."""
    nc = len(target_names)
    cm = confusion_matrix(y_true, y_pred, nc)
    tp = np.diag(cm).astype(np.float64)
    pred_tot = cm.sum(axis=0).astype(np.float64)
    true_tot = cm.sum(axis=1).astype(np.float64)
    prec = np.where(pred_tot > 0, tp / np.maximum(pred_tot, 1), 0.0)
    rec = np.where(true_tot > 0, tp / np.maximum(true_tot, 1), 0.0)
    f1 = np.where(prec + rec > 0, 2 * prec * rec / np.maximum(prec + rec, 1e-300), 0.0)

    width = max(max(len(n) for n in target_names), 12)
    head = f"{'':>{width}} {'precision':>9} {'recall':>9} {'f1-score':>9} {'support':>9}\n\n"
    lines = [head]
    for i, name in enumerate(target_names):
        lines.append(f"{name:>{width}} {prec[i]:>9.{digits}f} {rec[i]:>9.{digits}f} "
                     f"{f1[i]:>9.{digits}f} {int(true_tot[i]):>9}\n")
    total = int(true_tot.sum())
    acc = accuracy(y_true, y_pred)
    lines.append(f"\n{'accuracy':>{width}} {'':>9} {'':>9} {acc:>9.{digits}f} {total:>9}\n")
    lines.append(f"{'macro avg':>{width}} {prec.mean():>9.{digits}f} "
                 f"{rec.mean():>9.{digits}f} {f1.mean():>9.{digits}f} {total:>9}\n")
    w = true_tot / max(total, 1)
    lines.append(f"{'weighted avg':>{width}} {(prec*w).sum():>9.{digits}f} "
                 f"{(rec*w).sum():>9.{digits}f} {(f1*w).sum():>9.{digits}f} {total:>9}\n")
    return "".join(lines)
