"""Serving export: ahead-of-time compiled, weight-embedded inference artifacts.

The reference has no serving story beyond `do_evaluations.py`; for production
deployment this module exports the trained model as a serialized StableHLO
artifact (`jax.export`) with the weights baked in as constants:

- the artifact is self-contained — loading it needs jax but NOT this framework,
  nor the config/scheme machinery;
- shapes are static (the dataset's padded shapes), matching how the model was
  trained and how XLA wants to serve it;
- the same artifact runs on any backend jax supports (TPU serving, CPU canary).

Usage:
    python export_serving.py configs/main/zinc/100k/egt.json  # -> <save_path>/serving/model.bin
or programmatically `TrainingBase.export_serving()` / `load_serving(path)`.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax import export as jax_export


def batch_spec(dataset, pad_len: int, batch_size: int) -> dict:
    """Abstract (shape, dtype) tree for one inference batch, derived from a
    dataset's first cached batch."""
    b = next(dataset.batches(dataset.splits[0], batch_size, shuffle=False,
                             pad_len=pad_len))
    return {k: jax.ShapeDtypeStruct(v.shape, v.dtype) for k, v in b.items()
            if k != "target"}


def export_predict(model, params, spec: dict) -> bytes:
    """Serialize `model.apply(params, batch)` with the weights embedded."""
    params = jax.device_get(params)  # bake host copies in as constants

    def predict(batch):
        out, _ = model.apply(params, batch, training=False)
        return out

    exported = jax_export.export(jax.jit(predict))(spec)
    return exported.serialize()


def save_serving(model, params, spec: dict, path: str) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    blob = export_predict(model, params, spec)
    with open(path, "wb") as fp:
        fp.write(blob)
    return path


def load_serving(path: str):
    """Load a serving artifact; returns `fn(batch) -> predictions`."""
    with open(path, "rb") as fp:
        exported = jax_export.deserialize(fp.read())

    def fn(batch: dict):
        batch = {k: np.asarray(v) for k, v in batch.items()}
        return exported.call(batch)

    return fn
