"""bfloat16 compute path + rematerialization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from egt_tpu.models.graph_model import EGTGraphModel
from tests.test_model_forward import random_zinc_batch, small_cfg


def test_bf16_close_to_f32():
    rng = np.random.default_rng(0)
    batch = random_zinc_batch(rng)
    params = EGTGraphModel(small_cfg()).init(jax.random.PRNGKey(0))

    out32, _ = EGTGraphModel(small_cfg()).apply(params, batch)
    out16, _ = EGTGraphModel(small_cfg(compute_dtype="bfloat16")).apply(
        params, batch)
    assert out16.dtype == jnp.float32  # output upcast for losses
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               rtol=0.05, atol=0.05)


def test_remat_matches_exact():
    rng = np.random.default_rng(1)
    batch = random_zinc_batch(rng)
    params = EGTGraphModel(small_cfg()).init(jax.random.PRNGKey(0))

    m_plain = EGTGraphModel(small_cfg())
    m_remat = EGTGraphModel(small_cfg(remat=True))

    def loss(model, p):
        out, _ = model.apply(p, batch)
        return (out ** 2).sum()

    l1 = loss(m_plain, params)
    l2 = loss(m_remat, params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)

    g1 = jax.grad(lambda p: loss(m_plain, p))(params)
    g2 = jax.grad(lambda p: loss(m_remat, p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_remat_dots_matches_exact():
    """Selective remat ("dots": matmul outputs resident, elementwise per-pair
    chain recomputed) must be a pure scheduling change — same loss/grads."""
    rng = np.random.default_rng(4)
    batch = random_zinc_batch(rng)
    params = EGTGraphModel(small_cfg()).init(jax.random.PRNGKey(0))

    m_plain = EGTGraphModel(small_cfg())
    m_rdots = EGTGraphModel(small_cfg(remat="dots"))

    def loss(model, p):
        out, _ = model.apply(p, batch)
        return (out ** 2).sum()

    np.testing.assert_allclose(float(loss(m_plain, params)),
                               float(loss(m_rdots, params)), rtol=1e-6)
    g1 = jax.grad(lambda p: loss(m_plain, p))(params)
    g2 = jax.grad(lambda p: loss(m_rdots, p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_remat_training_stochastic_runs():
    rng = np.random.default_rng(2)
    batch = random_zinc_batch(rng)
    cfg = small_cfg(remat=True, random_mask_prob=0.1, node_dropout=0.1)
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))

    def loss(p):
        out, _ = model.apply(p, batch, training=True, rng=jax.random.PRNGKey(3))
        return (out ** 2).sum()

    g = jax.grad(loss)(params)
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree_util.tree_leaves(g))
