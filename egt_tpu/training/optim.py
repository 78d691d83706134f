"""Optimizer construction (optax).

Equivalent of `TrainingBase.get_optimizer` (`lib/training/training_base.py:59-73`):
adam / rmsprop / sgd with optional element-wise gradient value clipping and a
dynamically adjustable learning rate (host-driven schedules write it into the
optimizer hyperparams each step).

Batch-norm moving statistics live inside the params tree (see `models/layers.py`); they are
masked out of the optimizer and updated directly from the forward pass.
"""

from __future__ import annotations

import jax
import optax

NON_TRAINABLE_KEYS = ("moving_mean", "moving_var")


def trainable_mask(params) -> object:
    """Pytree of bools: False for non-trainable leaves (BN moving stats)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def is_trainable(path):
        return not any(
            getattr(k, "key", None) in NON_TRAINABLE_KEYS for k in path)

    paths = {tuple(p): is_trainable(p) for p, _ in flat}

    def mask_fn(path, leaf):
        del leaf
        return paths[tuple(path)]

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def make_optimizer(name: str = "adam", learning_rate: float = 5e-4,
                   clip_value: float | None = None,
                   params=None) -> optax.GradientTransformation:
    name = name.lower()

    def base(lr):
        # eps values match the Keras defaults the reference trains with
        # (tf.keras Adam eps=1e-7, RMSprop eps=1e-7).
        if name == "adam":
            return optax.adam(lr, eps=1e-7)
        if name == "rmsprop":
            return optax.rmsprop(lr, eps=1e-7)
        if name == "sgd":
            return optax.sgd(lr)
        raise ValueError(f"unknown optimizer {name!r}")

    mask = trainable_mask(params) if params is not None else None
    inv_mask = jax.tree_util.tree_map(lambda m: not m, mask) \
        if mask is not None else None

    @optax.inject_hyperparams
    def make(learning_rate):
        chain = []
        if clip_value is not None:
            chain.append(optax.clip(clip_value))
        chain.append(base(learning_rate))
        inner = optax.chain(*chain)
        if mask is None:
            return inner
        # trainable leaves get the real optimizer; non-trainable (BN moving stats)
        # get zero updates — they are written directly from the forward pass.
        return optax.chain(
            optax.masked(inner, mask),
            optax.masked(optax.set_to_zero(), inv_mask),
        )

    return make(learning_rate)


def set_learning_rate(opt_state, lr):
    """Write a new learning rate into an inject_hyperparams (possibly masked)
    optimizer state."""
    import jax.numpy as jnp

    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state._replace(hyperparams=hp)


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])
