"""Multi-chip dry run: jit the FULL training step over an n-device mesh.

Used by __graft_entry__.dryrun_multichip — validates that the data-parallel +
tensor-parallel shardings compile and execute (on virtual CPU devices or a real slice).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.graph_model import EGTGraphModel, GraphModelConfig
from ..training import metrics as M
from ..training import optim
from . import mesh as meshlib
from .partitioning import params_sharding


def tiny_model_config(**kw) -> GraphModelConfig:
    defaults = dict(
        model_width=32, edge_width=16, num_heads=4, model_height=2,
        node_input_kind="tokens", edge_input_kind="tokens",
        num_node_features=28, num_edge_features=4, num_targets=1,
        readout_kind="graph", upto_hop=2, random_mask_prob=0.1,
    )
    defaults.update(kw)
    return GraphModelConfig(**defaults)


def synthetic_batch(rng, b, l, num_node_feats=28, num_edge_feats=4):
    num_nodes = rng.integers(l // 2, l + 1, size=b)
    nodef = np.full((b, l), -1, np.int32)
    fmat = np.full((b, l, l), -1, np.int32)
    adj = np.zeros((b, l, l), np.float32)
    for i, n in enumerate(num_nodes):
        nodef[i, :n] = rng.integers(0, num_node_feats, size=n)
        m = 2 * n
        src = rng.integers(0, n, size=m)
        dst = (src + 1 + rng.integers(0, max(n - 1, 1), size=m)) % n
        adj[i, src, dst] = 1.0
        adj[i, np.arange(n), np.arange(n)] += 1.0
        fmat[i, src, dst] = rng.integers(0, num_edge_feats, size=m)
    return {
        "node_features": nodef,
        "feature_matrix": fmat,
        "graph_matrix": adj,
        "target": rng.normal(size=(b, 1)).astype(np.float32),
        "sample_mask": np.ones((b,), np.float32),
    }


def run_one_step(n_devices: int, model_parallel: int | None = None,
                 batch_size: int | None = None, max_len: int = 16) -> float:
    """Build mesh (data x model), shard params (TP) and batch (DP), jit one full
    train step (fwd + bwd + adam update), execute, return the loss."""
    if model_parallel is None:
        model_parallel = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
    mesh = meshlib.make_mesh(n_devices, model_parallel=model_parallel)
    dp = n_devices // model_parallel
    if batch_size is None:
        batch_size = 2 * dp

    cfg = tiny_model_config()
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))

    psh = params_sharding(params, mesh, tensor_parallel=(model_parallel > 1))
    params = jax.tree_util.tree_map(jax.device_put, params, psh)

    optimizer = optim.make_optimizer("adam", 1e-3, params=params)
    opt_state = optimizer.init(params)

    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, batch_size, max_len)
    bsh = meshlib.batch_sharding(mesh)
    batch = {k: jax.device_put(v, bsh) for k, v in batch.items()}

    def loss_fn(p, b, key):
        out, ctx = model.apply(p, b, training=True, rng=key)
        s, c = M.mae_loss(out, b["target"], None, b["sample_mask"])
        loss = s / jnp.maximum(c, 1.0)
        for v in ctx.losses.values():
            loss = loss + v
        return loss

    @jax.jit
    def train_step(p, o, b, key):
        loss, grads = jax.value_and_grad(loss_fn)(p, b, key)
        updates, o = optimizer.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return p, o, loss

    params, opt_state, loss = train_step(params, opt_state, batch,
                                         jax.random.PRNGKey(1))
    return float(loss)


def run_one_step_sp(n_devices: int, sp: int | None = None,
                    batch_size: int | None = None, max_len: int = 16) -> float:
    """Full train step with combined DP x SP (edge partitioning): batch sharded
    over 'data', the N x N attention grid + edge channel row-sharded over
    'model' via shard_map, adam update on replicated params."""
    from . import edge_partition as ep

    if sp is None:
        sp = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
    mesh = meshlib.make_mesh(n_devices, model_parallel=sp)
    dp = n_devices // sp
    if batch_size is None:
        batch_size = 2 * dp
    if max_len % sp:
        raise ValueError("max_len must divide by sp")

    cfg = tiny_model_config(random_mask_prob=0.0)  # sp fwd is deterministic here
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    params = meshlib.replicate_tree(params, mesh)

    optimizer = optim.make_optimizer("adam", 1e-3, params=params)
    opt_state = optimizer.init(params)

    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, batch_size, max_len)

    def loss_fn(p, b):
        out = ep.edge_partitioned_forward(
            model, p, b, mesh, axis=meshlib.MODEL_AXIS,
            data_axis=meshlib.DATA_AXIS)
        s, c = M.mae_loss(out, b["target"], None, b["sample_mask"])
        return s / jnp.maximum(c, 1.0)

    @jax.jit
    def train_step(p, o, b):
        loss, grads = jax.value_and_grad(loss_fn)(p, b)
        updates, o = optimizer.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return p, o, loss

    with mesh:
        params, opt_state, loss = train_step(params, opt_state, batch)
    return float(loss)
