"""Device mesh + sharding helpers.

The TPU-native replacement for the reference's `tf.distribute.MirroredStrategy`
(`lib/training/training_base.py:230-247`): a 1-D (or 2-D data x model) `jax.sharding.Mesh`
with the batch axis sharded over 'data'.  XLA inserts the gradient all-reduce over
ICI/DCN automatically because parameters are replicated while the batch is sharded —
no hand-written collectives needed for data parallelism.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(num_devices: int | None = None, model_parallel: int = 1,
              devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put a host batch with the leading axis sharded over 'data'.

    One device_put over the whole dict — a single batched transfer (matters a
    lot when the chip sits behind a network tunnel). Multi-host feeding goes
    through `jax.make_array_from_process_local_data` (see `put_global_batch`).
    """
    return jax.device_put(batch, batch_sharding(mesh))


def put_global_batch(batch: dict, mesh: Mesh) -> dict:
    """Multi-host batch feeding. Every process iterates the SAME global batch
    stream (the dataset is seeded identically), so each process slices out the
    rows owned by its addressable devices and contributes them via
    `jax.make_array_from_process_local_data` — the multi-host analog of the
    reference's per-replica dataset distribution (`training_base.py:230-247`)."""
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(batch, sh)

    def make(v):
        idx_map = sh.addressable_devices_indices_map(v.shape)
        starts = [sl[0].start or 0 for sl in idx_map.values()]
        stops = [v.shape[0] if sl[0].stop is None else sl[0].stop
                 for sl in idx_map.values()]
        return jax.make_array_from_process_local_data(
            sh, v[min(starts):max(stops)])

    return {k: make(v) for k, v in batch.items()}


def replicate_tree(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.device_put(tree, rep)
