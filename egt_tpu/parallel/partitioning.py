"""Parameter partitioning rules (tensor parallelism over the 'model' mesh axis).

Megatron-style sharding for the EGT stack: the QKV and FFN-up projections are
column-parallel (output features sharded), the attention-output and FFN-down
projections are row-parallel (input features sharded). Attention heads therefore
compute shard-locally and XLA inserts the psum on the row-parallel matmuls.

The reference has no tensor parallelism (SURVEY.md §2.9) — this is a beyond-reference
scale-out capability; at the benchmark model sizes it is off by default.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# param-name -> (kernel spec, bias spec)
_COLUMN = (P(None, MODEL_AXIS), P(MODEL_AXIS))
_ROW = (P(MODEL_AXIS, None), P())

_RULES = {
    "dense_qkv": _COLUMN,
    "dense_mha": _ROW,
    "lr1": _COLUMN,
    "lr2": _ROW,
}


def _path_keys(path):
    keys = []
    for p in path:
        k = getattr(p, "key", None)
        if k is None:
            k = getattr(p, "idx", None)
        keys.append(k)
    return keys


def params_sharding(params, mesh: Mesh, tensor_parallel: bool = True):
    """A pytree of NamedShardings matching `params`."""
    rep = NamedSharding(mesh, P())

    def rule(path, leaf):
        del leaf
        if not tensor_parallel:
            return rep
        keys = _path_keys(path)
        for name, (kspec, bspec) in _RULES.items():
            if name in keys:
                if keys[-1] == "kernel":
                    return NamedSharding(mesh, kspec)
                if keys[-1] == "bias":
                    return NamedSharding(mesh, bspec)
        return rep

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params, mesh: Mesh, tensor_parallel: bool = True):
    shardings = params_sharding(params, mesh, tensor_parallel)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
