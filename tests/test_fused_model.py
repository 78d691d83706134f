"""Full-model equivalence: fused (Pallas, interpret on CPU) vs einsum path."""

import jax
import numpy as np

from egt_tpu.models.graph_model import EGTGraphModel
from tests.test_model_forward import random_zinc_batch, small_cfg


def test_fused_model_matches_einsum():
    rng = np.random.default_rng(0)
    batch = random_zinc_batch(rng)

    cfg_ref = small_cfg()
    cfg_fused = small_cfg(fused_attention=True)
    model_ref = EGTGraphModel(cfg_ref)
    model_fused = EGTGraphModel(cfg_fused)
    params = model_ref.init(jax.random.PRNGKey(0))

    out_ref, _ = model_ref.apply(params, batch)
    out_fused, _ = model_fused.apply(params, batch)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_model_grads_match():
    rng = np.random.default_rng(1)
    batch = random_zinc_batch(rng)

    def make_loss(cfg):
        model = EGTGraphModel(cfg)

        def loss(p):
            out, _ = model.apply(p, batch)
            return (out ** 2).sum()
        return model, loss

    model, loss_ref = make_loss(small_cfg())
    _, loss_fused = make_loss(small_cfg(fused_attention=True))
    params = model.init(jax.random.PRNGKey(0))

    g_ref = jax.grad(loss_ref)(params)
    g_fused = jax.grad(loss_fused)(params)
    flat_r = jax.tree_util.tree_leaves(g_ref)
    flat_f = jax.tree_util.tree_leaves(g_fused)
    for a, b in zip(flat_f, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_fused_constrained_variant():
    rng = np.random.default_rng(2)
    batch = random_zinc_batch(rng)
    cfg_ref = small_cfg(edge_channel_type="constrained")
    cfg_fused = small_cfg(edge_channel_type="constrained", fused_attention=True)
    model_ref = EGTGraphModel(cfg_ref)
    model_fused = EGTGraphModel(cfg_fused)
    params = model_ref.init(jax.random.PRNGKey(0))
    out_ref, _ = model_ref.apply(params, batch)
    out_fused, _ = model_fused.apply(params, batch)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)
