"""Streaming evaluation metrics: accuracy, AUC-ROC, AUC-PR, means, loss.

Device-side accumulators + host-side finalization, matching the metric set
the reference got from its canned head (/root/reference/python/lib/
joint.py:402-412, printed at train.py:91-92 and eval.py:82-83): accuracy,
auc, auc_precision_recall, average_loss, loss, label/mean, prediction/mean,
plus global_step added by the loop.

AUC follows tf.metrics.auc's bucketed confusion-matrix construction:
num_thresholds=200 with +/-epsilon end anchors and trapezoidal integration.
All updates are jit-friendly (fixed [T] accumulators, one [T, B] comparison
per batch) and respect the batch padding mask via the weight vector.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

NUM_THRESHOLDS = 200
_EPS = 1e-7


def thresholds(num: int = NUM_THRESHOLDS) -> np.ndarray:
    """tf.metrics.auc threshold ladder with epsilon end anchors."""
    inner = [(i + 1) / (num - 1) for i in range(num - 2)]
    return np.array([-_EPS] + inner + [1.0 + _EPS], dtype=np.float32)


def init_metrics(num_thresholds: int = NUM_THRESHOLDS) -> Dict[str, jnp.ndarray]:
    T = num_thresholds
    z = lambda *s: jnp.zeros(s, jnp.float32)
    return {
        "tp": z(T), "fp": z(T), "tn": z(T), "fn": z(T),
        "loss_sum": z(), "weight_sum": z(),
        "correct": z(), "label_sum": z(), "pred_sum": z(),
    }


def update_metrics(acc: Dict[str, jnp.ndarray], probs: jnp.ndarray,
                   labels: jnp.ndarray, weights: jnp.ndarray,
                   per_example_loss: jnp.ndarray,
                   correct: jnp.ndarray = None) -> Dict[str, jnp.ndarray]:
    """Fold one batch into the accumulators (all [B] vectors, weights
    already include the padding mask).

    ``correct`` is an optional precomputed 0/1 correctness vector; for the
    multiclass head it must be ``argmax(probabilities) == label`` (the binary
    default ``(p >= 0.5) == label`` compares a 0/1 indicator against class
    ids and is wrong for K > 2)."""
    t = jnp.asarray(thresholds(acc["tp"].shape[0]))
    p = probs.astype(jnp.float32)
    y = labels.astype(jnp.float32)
    w = weights.astype(jnp.float32)
    pred_pos = (p[None, :] > t[:, None]).astype(jnp.float32)   # [T, B]
    wy = w * y
    wn = w * (1.0 - y)
    out = dict(acc)
    out["tp"] = acc["tp"] + pred_pos @ wy
    out["fp"] = acc["fp"] + pred_pos @ wn
    out["fn"] = acc["fn"] + (1.0 - pred_pos) @ wy
    out["tn"] = acc["tn"] + (1.0 - pred_pos) @ wn
    out["loss_sum"] = acc["loss_sum"] + jnp.sum(per_example_loss * w)
    out["weight_sum"] = acc["weight_sum"] + jnp.sum(w)
    if correct is None:
        correct = (p >= 0.5).astype(jnp.float32) == y
    out["correct"] = acc["correct"] + jnp.sum(correct.astype(jnp.float32) * w)
    out["label_sum"] = acc["label_sum"] + jnp.sum(wy)
    out["pred_sum"] = acc["pred_sum"] + jnp.sum(p * w)
    return out


def finalize_metrics(acc: Dict[str, jnp.ndarray],
                     binary: bool = True) -> Dict[str, float]:
    """``binary=False`` (multiclass head) drops the threshold-sweep metrics
    (auc, auc_precision_recall, label/prediction means): they are only
    defined against a single positive-class probability, matching the
    reference's multiclass head which reported loss + accuracy only
    (/root/reference/python/lib/joint.py:406-412)."""
    a = {k: np.asarray(v) for k, v in acc.items()}
    eps = 1e-12
    w = max(float(a["weight_sum"]), eps)
    out = {
        "accuracy": float(a["correct"]) / w,
        "average_loss": float(a["loss_sum"]) / w,
        "loss": float(a["loss_sum"]) / w,
    }
    if not binary:
        return out
    tp, fp, tn, fn = a["tp"], a["fp"], a["tn"], a["fn"]
    tpr = tp / np.maximum(tp + fn, eps)
    fpr = fp / np.maximum(fp + tn, eps)
    # thresholds ascend => tpr/fpr descend; integrate along increasing fpr
    auc_roc = float(np.trapezoid(tpr[::-1], fpr[::-1]))
    precision = tp / np.maximum(tp + fp, eps)
    recall = tpr
    auc_pr = float(np.trapezoid(precision[::-1], recall[::-1]))
    out.update({
        "auc": auc_roc,
        "auc_precision_recall": auc_pr,
        "label/mean": float(a["label_sum"]) / w,
        "prediction/mean": float(a["pred_sum"]) / w,
    })
    return out
