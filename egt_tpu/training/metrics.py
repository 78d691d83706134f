"""Losses and streaming metrics.

JAX equivalents of the reference's Keras losses/metrics with explicit masking:
Keras propagates an output mask into compiled losses/metrics invisibly; here every loss
takes an optional `mask` and an optional per-graph `sample_mask` (for the padded final
batch, see `data/dataset.py`) and reduces as a weighted mean.

Class-imbalance weighting matches `WeightedSparseXEntropyLoss`
(`lib/base/genutil/losses.py:40-63`): weight_c = (sum(sizes) - size_c) / sum(weights).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def class_weights_from_sizes(class_sizes) -> np.ndarray:
    sizes = np.asarray(class_sizes, dtype="float32")
    w = sizes.sum() - sizes
    return w / w.sum()


def _weighted_mean(values: jax.Array, weights: jax.Array):
    """Returns (weighted sum, weight total) for streaming aggregation."""
    return jnp.sum(values * weights), jnp.sum(weights)


def mae_loss(pred, target, mask=None, sample_mask=None):
    err = jnp.abs(pred - target)
    w = jnp.ones_like(err)
    if sample_mask is not None:
        w = w * sample_mask.reshape((-1,) + (1,) * (err.ndim - 1))
    if mask is not None:
        w = w * mask.astype(err.dtype)
    return _weighted_mean(err, w)


def sparse_xent_logits(pred, target):
    """Element-wise sparse categorical cross-entropy from logits."""
    logp = jax.nn.log_softmax(pred, axis=-1)
    return -jnp.take_along_axis(logp, target[..., None], axis=-1,
                                mode="clip")[..., 0]


def sparse_xent_loss(pred, target, mask=None, sample_mask=None,
                     class_weights=None):
    elem = sparse_xent_logits(pred, target)
    w = jnp.ones_like(elem)
    if class_weights is not None:
        cw = jnp.asarray(class_weights, dtype=elem.dtype)
        elem = elem * jnp.take(cw, target, axis=0)
    if sample_mask is not None:
        w = w * sample_mask.reshape((-1,) + (1,) * (elem.ndim - 1))
    if mask is not None:
        w = w * mask.astype(elem.dtype)
    return _weighted_mean(elem, w)


def accuracy(pred, target, mask=None, sample_mask=None):
    correct = (jnp.argmax(pred, axis=-1) == target).astype(jnp.float32)
    w = jnp.ones_like(correct)
    if sample_mask is not None:
        w = w * sample_mask.reshape((-1,) + (1,) * (correct.ndim - 1))
    if mask is not None:
        w = w * mask.astype(correct.dtype)
    return _weighted_mean(correct, w)


class MetricAccumulator:
    """Host-side streaming (sum, count) accumulator for per-batch metric pairs."""

    def __init__(self):
        self._sums: dict[str, float] = {}
        self._counts: dict[str, float] = {}

    def update(self, pairs: dict):
        for name, (s, c) in pairs.items():
            self._sums[name] = self._sums.get(name, 0.0) + float(s)
            self._counts[name] = self._counts.get(name, 0.0) + float(c)

    def result(self) -> dict:
        return {
            k: (self._sums[k] / self._counts[k]) if self._counts[k] > 0 else 0.0
            for k in self._sums
        }

    def reset(self):
        self._sums.clear()
        self._counts.clear()
