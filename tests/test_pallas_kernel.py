"""Fused Pallas EGT attention vs. the einsum reference op — forward and gradients.

Runs in Pallas interpret mode on CPU; the same code path compiles on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egt_tpu.models.egt import egt_attention
from egt_tpu.ops.egt_pallas import egt_attention_fused


def make_inputs(rng, b=2, l=12, d=4, h=3):
    q = rng.normal(size=(b, h, l, d)).astype(np.float32)
    k = rng.normal(size=(b, h, l, d)).astype(np.float32)
    v = rng.normal(size=(b, h, l, d)).astype(np.float32)
    e = rng.normal(size=(b, h, l, l)).astype(np.float32)
    g = rng.normal(size=(b, h, l, l)).astype(np.float32)
    mask = np.ones((b, l), bool)
    mask[0, l - 4:] = False
    return q, k, v, e, g, mask


def to_ref_layout(q, k, v, e, g):
    """head-major -> the reference op's qkv (b,l,3dh) / (b,l,l,h) layout."""
    b, h, l, d = q.shape
    def mk(x):
        return jnp.transpose(x, (0, 2, 3, 1))            # (b, l, d, h)
    qkv = jnp.stack([mk(q), mk(k), mk(v)], axis=2)       # (b, l, 3, d, h)
    qkv = qkv.reshape(b, l, 3 * d * h)
    et = None if e is None else jnp.transpose(e, (0, 2, 3, 1))
    gt = None if g is None else jnp.transpose(g, (0, 2, 3, 1))
    return qkv, et, gt


@pytest.mark.parametrize("gated", [True, False])
@pytest.mark.parametrize("scale_degree", [False, True])
def test_fused_forward_matches_reference(gated, scale_degree):
    if scale_degree and not gated:
        pytest.skip("scale_degree requires gating")
    rng = np.random.default_rng(0)
    q, k, v, e, g, mask = make_inputs(rng)
    b, h, l, d = q.shape

    fused = egt_attention_fused(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(e),
        jnp.asarray(g) if gated else None,
        node_mask=jnp.asarray(mask), scale_degree=scale_degree,
        num_virtual_nodes=2 if scale_degree else 0)

    qkv, et, gt = to_ref_layout(q, k, v, e, g if gated else None)
    ref = egt_attention(qkv, et, gt, num_heads=h, node_mask=jnp.asarray(mask),
                        scale_degree=scale_degree,
                        num_virtual_nodes=2 if scale_degree else 0)

    np.testing.assert_allclose(np.asarray(fused.v_att), np.asarray(ref.v_att),
                               rtol=1e-5, atol=1e-5)
    h_hat_ref = jnp.transpose(ref.h_hat, (0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(fused.h_hat), np.asarray(h_hat_ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_constrained_mask():
    rng = np.random.default_rng(1)
    q, k, v, e, g, mask = make_inputs(rng)
    b, h, l, d = q.shape
    am = (rng.random((b, l, l)) < 0.5).astype(np.float32)

    fused = egt_attention_fused(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(e),
        jnp.asarray(g), node_mask=jnp.asarray(mask),
        attn_mask_hm=jnp.asarray(am))

    qkv, et, gt = to_ref_layout(q, k, v, e, g)
    am4 = jnp.tile(jnp.asarray(am)[..., None], (1, 1, 1, h))
    ref = egt_attention(qkv, et, gt, num_heads=h, node_mask=jnp.asarray(mask),
                        attn_mask=am4)
    np.testing.assert_allclose(np.asarray(fused.v_att), np.asarray(ref.v_att),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("gated", [True, False])
def test_fused_gradients_match_reference(gated):
    rng = np.random.default_rng(2)
    q, k, v, e, g, mask = make_inputs(rng)
    b, h, l, d = q.shape
    maskj = jnp.asarray(mask)

    def loss_fused(q, k, v, e, g):
        out = egt_attention_fused(q, k, v, e, g if gated else None,
                                  node_mask=maskj, scale_degree=gated,
                                  num_virtual_nodes=1 if gated else 0)
        # use both outputs so both cotangent paths are exercised
        return jnp.sum(out.v_att ** 2) + jnp.sum(jnp.tanh(out.h_hat))

    def loss_ref(q, k, v, e, g):
        qkv, et, gt = to_ref_layout(q, k, v, e, g if gated else None)
        ref = egt_attention(qkv, et, gt, num_heads=h, node_mask=maskj,
                            scale_degree=gated,
                            num_virtual_nodes=1 if gated else 0)
        h_hat_hm = jnp.transpose(ref.h_hat, (0, 3, 1, 2))
        return jnp.sum(ref.v_att ** 2) + jnp.sum(jnp.tanh(h_hat_hm))

    args = tuple(jnp.asarray(x) for x in (q, k, v, e, g))
    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    names = ["dq", "dk", "dv", "de", "dg"]
    for i, (a, b_) in enumerate(zip(gf, gr)):
        if not gated and i == 4:
            continue  # gate grads undefined in ungated mode
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4, err_msg=names[i])


@pytest.mark.parametrize("gated", [True, False])
def test_q_tiled_grid_matches_reference(monkeypatch, gated):
    """Shrink the VMEM cap so the (b, h, q-block) grid actually tiles queries;
    forward, h_hat and gradients (incl. the accumulated dk/dv) must be unchanged."""
    from egt_tpu.ops import egt_pallas

    monkeypatch.setattr(egt_pallas, "_MAX_QL_ELEMS", 8 * 16)  # l=16 -> qb=8, nq=2
    rng = np.random.default_rng(4)
    q, k, v, e, g, mask = make_inputs(rng, b=2, l=16, d=4, h=2)
    maskj = jnp.asarray(mask)
    args = tuple(jnp.asarray(x) for x in (q, k, v, e, g))

    fused = egt_attention_fused(*args[:4], args[4] if gated else None,
                                node_mask=maskj, scale_degree=gated)
    qkv, et, gt = to_ref_layout(q, k, v, e, g if gated else None)
    ref = egt_attention(qkv, et, gt, num_heads=2, node_mask=maskj,
                        scale_degree=gated)
    np.testing.assert_allclose(np.asarray(fused.v_att), np.asarray(ref.v_att),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused.h_hat),
                               np.asarray(jnp.transpose(ref.h_hat, (0, 3, 1, 2))),
                               rtol=1e-5, atol=1e-5)

    def loss_fused(q, k, v, e, g):
        out = egt_attention_fused(q, k, v, e, g if gated else None,
                                  node_mask=maskj)
        return jnp.sum(out.v_att ** 2) + jnp.sum(jnp.tanh(out.h_hat))

    def loss_ref(q, k, v, e, g):
        qkv, et, gt = to_ref_layout(q, k, v, e, g if gated else None)
        ref = egt_attention(qkv, et, gt, num_heads=2, node_mask=maskj)
        h_hat_hm = jnp.transpose(ref.h_hat, (0, 3, 1, 2))
        return jnp.sum(ref.v_att ** 2) + jnp.sum(jnp.tanh(h_hat_hm))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for i, (a, b_) in enumerate(zip(gf, gr)):
        if not gated and i == 4:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=["dq", "dk", "dv", "de", "dg"][i])


def test_q_tiled_stochastic_deterministic(monkeypatch):
    """Per-tile PRNG seeding: same rng -> identical output under tiling, and the
    backward pass regenerates the same per-tile bits (finite grads)."""
    from egt_tpu.ops import egt_pallas

    monkeypatch.setattr(egt_pallas, "_MAX_QL_ELEMS", 8 * 16)
    rng = np.random.default_rng(5)
    q, k, v, e, g, mask = make_inputs(rng, b=2, l=16, d=4, h=2)
    args = tuple(jnp.asarray(x) for x in (q, k, v, e, g))
    maskj = jnp.asarray(mask)

    def run(key):
        return egt_attention_fused(*args, node_mask=maskj,
                                   random_mask_prob=0.3, attn_dropout=0.1,
                                   training=True, rng=key).v_att

    o1, o2, o3 = run(jax.random.PRNGKey(0)), run(jax.random.PRNGKey(0)), \
        run(jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))
    assert not np.allclose(np.asarray(o1), np.asarray(o3))

    def loss(q):
        out = egt_attention_fused(q, *args[1:], node_mask=maskj,
                                  random_mask_prob=0.3, training=True,
                                  rng=jax.random.PRNGKey(0))
        return jnp.sum(out.v_att ** 2)

    gq = jax.grad(loss)(args[0])
    assert np.all(np.isfinite(np.asarray(gq)))


def test_fused_stochastic_deterministic_given_rng():
    """Same rng -> same output; gradient runs (backward regenerates masks)."""
    rng = np.random.default_rng(3)
    q, k, v, e, g, mask = make_inputs(rng)
    args = tuple(jnp.asarray(x) for x in (q, k, v, e, g))
    maskj = jnp.asarray(mask)

    def run(key):
        return egt_attention_fused(*args, node_mask=maskj,
                                   random_mask_prob=0.3, attn_dropout=0.1,
                                   training=True, rng=key).v_att

    o1 = run(jax.random.PRNGKey(0))
    o2 = run(jax.random.PRNGKey(0))
    o3 = run(jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))
    assert not np.allclose(np.asarray(o1), np.asarray(o3))

    def loss(q):
        out = egt_attention_fused(q, *args[1:], node_mask=maskj,
                                  random_mask_prob=0.3, training=True,
                                  rng=jax.random.PRNGKey(0))
        return jnp.sum(out.v_att ** 2)

    gq = jax.grad(loss)(args[0])
    assert np.all(np.isfinite(np.asarray(gq)))


# ------------------------------------------------- rectangular (edge-partitioned)


@pytest.mark.parametrize("gated", [True, False])
@pytest.mark.parametrize("scale_degree", [False, True])
def test_rectangular_forward_matches_reference(gated, scale_degree):
    """Row-shard queries (lq < lk, the edge-partitioning layout): the kernel's
    output must equal the einsum core on the same row shard."""
    if scale_degree and not gated:
        pytest.skip("scale_degree requires gating")
    rng = np.random.default_rng(7)
    q, k, v, e, g, mask = make_inputs(rng, l=16)
    vn = 2 if scale_degree else 0
    r0, lq = 4, 6  # rows [0,vn) + [r0, r0+lq) emulate a shard's (VN + local) rows
    rows = np.concatenate([np.arange(vn), np.arange(r0, r0 + lq)])
    qs, es, gs = q[:, :, rows], e[:, :, rows], g[:, :, rows]

    fused = egt_attention_fused(
        jnp.asarray(qs), jnp.asarray(k), jnp.asarray(v), jnp.asarray(es),
        jnp.asarray(gs) if gated else None,
        node_mask=jnp.asarray(mask), scale_degree=scale_degree,
        num_virtual_nodes=vn)

    # einsum core on the identical row shard (channel-last layout)
    from egt_tpu.models.egt import egt_attention_core
    cl = lambda x: jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))
    qc = jnp.transpose(jnp.asarray(qs), (0, 2, 3, 1))
    kc = jnp.transpose(jnp.asarray(k), (0, 2, 3, 1))
    vc = jnp.transpose(jnp.asarray(v), (0, 2, 3, 1))
    ref = egt_attention_core(
        qc, kc, vc, cl(es), cl(gs) if gated else None,
        node_mask=jnp.asarray(mask), scale_degree=scale_degree,
        num_virtual_nodes=vn)

    np.testing.assert_allclose(np.asarray(fused.v_att), np.asarray(ref.v_att),
                               rtol=1e-5, atol=1e-5)
    h_hat_ref = jnp.transpose(ref.h_hat, (0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(fused.h_hat), np.asarray(h_hat_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("gated", [True, False])
def test_rectangular_gradients_match_reference(gated):
    rng = np.random.default_rng(8)
    q, k, v, e, g, mask = make_inputs(rng, l=16)
    lq = 6
    qs, es, gs = q[:, :, :lq], e[:, :, :lq], g[:, :, :lq]
    maskj = jnp.asarray(mask)
    b, h, l, d = q.shape

    from egt_tpu.models.egt import egt_attention_core

    def loss_fused(qs, k, v, es, gs):
        out = egt_attention_fused(qs, k, v, es, gs if gated else None,
                                  node_mask=maskj, scale_degree=gated)
        return jnp.sum(out.v_att ** 2) + jnp.sum(jnp.tanh(out.h_hat))

    def loss_ref(qs, k, v, es, gs):
        cl = lambda x: jnp.transpose(x, (0, 2, 3, 1))
        ref = egt_attention_core(cl(qs), cl(k), cl(v), cl(es),
                                 cl(gs) if gated else None,
                                 node_mask=maskj, scale_degree=gated)
        h_hat_hm = jnp.transpose(ref.h_hat, (0, 3, 1, 2))
        return jnp.sum(ref.v_att ** 2) + jnp.sum(jnp.tanh(h_hat_hm))

    args = tuple(jnp.asarray(x) for x in (qs, k, v, es, gs))
    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    names = ["dq", "dk", "dv", "de", "dg"]
    for i, (a, b_) in enumerate(zip(gf, gr)):
        if not gated and i == 4:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4, err_msg=names[i])
