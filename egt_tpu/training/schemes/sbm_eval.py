"""SBM (PATTERN/CLUSTER) sklearn-based evaluation helpers.

Re-implements the metrics of the reference eval mixins
(`lib/training/schemes/pattern/_eval.py:10-111`, `cluster/_eval.py:10-94`):
accuracy, micro/macro recall, the Dwivedi-et-al class-balanced "SBM accuracy", and
(PATTERN) the class-weighted binary log loss.
"""

from __future__ import annotations

import numpy as np
from sklearn.metrics import accuracy_score, confusion_matrix, recall_score

from ..metrics import class_weights_from_sizes


def accuracy_sbm(targets: np.ndarray, preds: np.ndarray) -> float:
    cm = confusion_matrix(targets, preds).astype(np.float32)
    nb = cm.shape[0]
    pr = np.zeros(nb)
    for r in range(nb):
        cluster = np.where(targets == r)[0]
        pr[r] = cm[r, r] / float(cluster.shape[0]) if cluster.shape[0] else 0.0
    return float(pr.sum() / nb)


def weighted_log_loss(targs, preds, weights, eps=1e-9) -> float:
    sw = weights[targs.astype("int64")].astype("float32")
    t = np.clip(targs.astype("float32"), 0.0, 1.0)
    p = np.clip(preds.astype("float32"), eps, 1.0 - eps)
    losses = -(t * np.log(p) + (1 - t) * np.log(1 - p)) * sw
    return float(losses.mean())


def collect_node_predictions(scheme, split: str, prob_of_class1: bool):
    """Run the jit predict step over a split and collect (targets, preds/probs) over
    valid node positions (node_features >= 0), concatenated across batches."""
    import jax

    targs, preds = [], []
    for batch, out in scheme.predict_split(split):
        valid = (batch["node_features"].reshape(-1) >= 0)
        t = batch["target"].reshape(-1)[valid]
        probs = jax.nn.softmax(out, axis=-1)
        probs = np.asarray(probs)
        if prob_of_class1:
            p = probs[..., 1].reshape(-1)[valid]
        else:
            p = probs.argmax(-1).reshape(-1)[valid]
        targs.append(t)
        preds.append(p)
    return np.concatenate(targs), np.concatenate(preds)


def evaluate_pattern(scheme, split: str, class_sizes) -> list[str]:
    targs, probs = collect_node_predictions(scheme, split, prob_of_class1=True)
    pred_class = np.round(probs).astype(targs.dtype)
    macro_rec = recall_score(targs, pred_class, average="macro")
    micro_rec = recall_score(targs, pred_class, average="micro")
    acc = accuracy_score(targs, pred_class)
    wacc = accuracy_sbm(targs, pred_class)
    ll = weighted_log_loss(targs, probs, class_weights_from_sizes(class_sizes))
    return [
        f"Accuracy = {acc:0.5%}",
        f"Micro Recall = {micro_rec:0.5%}",
        f"Macro Recall = {macro_rec:0.5%}",
        f"Weighted Accuracy = {wacc:0.5%}",
        f"Log loss:{ll:0.5f}",
    ]


def evaluate_cluster(scheme, split: str) -> list[str]:
    targs, preds = collect_node_predictions(scheme, split, prob_of_class1=False)
    micro_rec = recall_score(targs, preds, average="micro")
    macro_rec = recall_score(targs, preds, average="macro")
    acc = accuracy_score(targs, preds)
    wacc = accuracy_sbm(targs, preds)
    return [
        f"Accuracy = {acc:0.5%}",
        f"Micro Recall = {micro_rec:0.5%}",
        f"Macro Recall = {macro_rec:0.5%}",
        f"Weighted Accuracy = {wacc:0.5%}",
    ]
