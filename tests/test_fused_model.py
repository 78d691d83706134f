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


def test_fused_edge_block_matches():
    """The fused dense_edge_r + residual + LN + FFN Pallas block vs unfused."""
    rng = np.random.default_rng(3)
    batch = random_zinc_batch(rng)
    model_ref = EGTGraphModel(small_cfg())
    model_fused = EGTGraphModel(small_cfg(fused_edge_block=True))
    params = model_ref.init(jax.random.PRNGKey(0))
    out_ref, _ = model_ref.apply(params, batch)
    out_fused, _ = model_fused.apply(params, batch)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_edge_block_grads_match():
    rng = np.random.default_rng(4)
    batch = random_zinc_batch(rng)
    model_ref = EGTGraphModel(small_cfg())
    model_fused = EGTGraphModel(small_cfg(fused_edge_block=True))
    params = model_ref.init(jax.random.PRNGKey(0))

    def loss(model, p):
        out, _ = model.apply(p, batch)
        return (out ** 2).sum()

    g_ref = jax.grad(lambda p: loss(model_ref, p))(params)
    g_fused = jax.grad(lambda p: loss(model_fused, p))(params)
    flat_r, treedef = jax.tree_util.tree_flatten(g_ref)
    flat_f, _ = jax.tree_util.tree_flatten(g_fused)
    for a, b in zip(flat_f, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_fused_edge_block_with_fused_attention():
    """Both kernels together; also checks the fallback when dropout is on."""
    rng = np.random.default_rng(5)
    batch = random_zinc_batch(rng)
    model_ref = EGTGraphModel(small_cfg())
    model_both = EGTGraphModel(small_cfg(fused_edge_block=True,
                                         fused_attention=True))
    params = model_ref.init(jax.random.PRNGKey(0))
    out_ref, _ = model_ref.apply(params, batch)
    out_both, _ = model_both.apply(params, batch)
    np.testing.assert_allclose(np.asarray(out_both), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)

    # edge_dropout > 0 at training time must fall back (and stay stochastic)
    cfg = small_cfg(fused_edge_block=True, edge_dropout=0.2)
    model_drop = EGTGraphModel(cfg)
    o1, _ = model_drop.apply(params, batch, training=True,
                             rng=jax.random.PRNGKey(1))
    o2, _ = model_drop.apply(params, batch, training=True,
                             rng=jax.random.PRNGKey(2))
    assert not np.allclose(o1, o2)


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
