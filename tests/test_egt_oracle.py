"""Numerical oracle tests: the JAX EGT attention op vs. an independent numpy
implementation of the math specified by the reference (`lib/models/egt_layers.py`)."""

import jax
import jax.numpy as jnp
import numpy as np

from egt_tpu.models.egt import egt_attention, split_qkv


def np_softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def oracle_egt(qkv, e_bias, gates, node_mask, num_heads, clip=(-5.0, 5.0),
               attn_mask=None, scale_degree=False, scaler_type="log",
               num_virtual_nodes=0):
    b, l, f = qkv.shape
    d = f // (3 * num_heads)
    q, k, v = [qkv.reshape(b, l, 3, d, num_heads)[:, :, i] for i in range(3)]

    a_hat = np.einsum("bldh,bmdh->blmh", q, k) * d ** -0.5
    if clip is not None:
        a_hat = np.clip(a_hat, clip[0], clip[1])
    h_hat = a_hat + (e_bias if e_bias is not None else 0.0)

    logits = h_hat.copy()
    g = None if gates is None else gates.copy()
    if node_mask is not None:
        madd = (node_mask.astype(np.float32)[:, None, :, None] - 1.0) * 1e9
        logits = logits + madd
        if g is not None:
            g = g + madd
    if attn_mask is not None:
        aadd = (attn_mask.astype(np.float32) - 1.0) * 1e9
        logits = logits + aadd
        if g is not None:
            g = g + aadd

    a_tild = np_softmax(logits, axis=2)
    if g is not None:
        sg = np_sigmoid(g)
        a_tild = a_tild * sg
    v_att = np.einsum("blmh,bmdh->bldh", a_tild, v)

    if scale_degree:
        deg = sg.sum(axis=2, keepdims=True)
        scalers = np.log1p(deg) if scaler_type == "log" else deg
        if num_virtual_nodes > 0:
            scalers = scalers.copy()
            scalers[:, :num_virtual_nodes] = 1.0
        v_att = v_att * scalers

    return v_att.reshape(b, l, d * num_heads), h_hat, a_tild


def make_inputs(rng, b=3, l=10, d=4, h=4):
    qkv = rng.normal(size=(b, l, 3 * d * h)).astype(np.float32)
    e = rng.normal(size=(b, l, l, h)).astype(np.float32)
    g = rng.normal(size=(b, l, l, h)).astype(np.float32)
    mask = np.ones((b, l), bool)
    mask[0, (7 * l) // 10:] = False
    if b > 2:
        mask[2, (4 * l) // 10:] = False
    return qkv, e, g, mask


def test_gated_matches_oracle():
    rng = np.random.default_rng(0)
    qkv, e, g, mask = make_inputs(rng)
    out = egt_attention(jnp.asarray(qkv), jnp.asarray(e), jnp.asarray(g),
                        num_heads=4, node_mask=jnp.asarray(mask))
    ov, oh, oa = oracle_egt(qkv, e, g, mask, num_heads=4)
    np.testing.assert_allclose(np.asarray(out.v_att), ov, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.h_hat), oh, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.a_tild), oa, rtol=1e-5, atol=1e-5)


def test_ungated_matches_oracle():
    rng = np.random.default_rng(1)
    qkv, e, _, mask = make_inputs(rng)
    out = egt_attention(jnp.asarray(qkv), jnp.asarray(e), None,
                        num_heads=4, node_mask=jnp.asarray(mask))
    ov, oh, oa = oracle_egt(qkv, e, None, mask, num_heads=4)
    np.testing.assert_allclose(np.asarray(out.v_att), ov, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.a_tild), oa, rtol=1e-5, atol=1e-5)


def test_degree_scaler_and_vn():
    rng = np.random.default_rng(2)
    qkv, e, g, mask = make_inputs(rng)
    out = egt_attention(jnp.asarray(qkv), jnp.asarray(e), jnp.asarray(g),
                        num_heads=4, node_mask=jnp.asarray(mask),
                        scale_degree=True, scaler_type="log",
                        num_virtual_nodes=2)
    ov, _, _ = oracle_egt(qkv, e, g, mask, num_heads=4, scale_degree=True,
                          scaler_type="log", num_virtual_nodes=2)
    np.testing.assert_allclose(np.asarray(out.v_att), ov, rtol=1e-5, atol=1e-5)


def test_constrained_hard_mask():
    rng = np.random.default_rng(3)
    qkv, e, g, mask = make_inputs(rng)
    am = (rng.random((3, 10, 10, 4)) < 0.5).astype(np.float32)
    out = egt_attention(jnp.asarray(qkv), jnp.asarray(e), jnp.asarray(g),
                        num_heads=4, node_mask=jnp.asarray(mask),
                        attn_mask=jnp.asarray(am))
    ov, _, oa = oracle_egt(qkv, e, g, mask, num_heads=4, attn_mask=am)
    np.testing.assert_allclose(np.asarray(out.v_att), ov, rtol=1e-5, atol=1e-5)


def test_padded_positions_zero_gate_contribution():
    """Padded keys must contribute zero attention AND zero degree, because the mask
    enters the gates pre-sigmoid (`egt_layers.py:91-94`)."""
    rng = np.random.default_rng(4)
    qkv, e, g, mask = make_inputs(rng)
    out = egt_attention(jnp.asarray(qkv), jnp.asarray(e), jnp.asarray(g),
                        num_heads=4, node_mask=jnp.asarray(mask),
                        scale_degree=True)
    a = np.asarray(out.a_tild)
    # batch 0 has keys 7..9 padded
    np.testing.assert_allclose(a[0, :, 7:, :], 0.0, atol=1e-12)


def test_logit_clipping_applied_before_bias():
    rng = np.random.default_rng(5)
    qkv, e, g, mask = make_inputs(rng)
    qkv = qkv * 100.0  # force logits far outside [-5, 5]
    out = egt_attention(jnp.asarray(qkv), jnp.asarray(e), jnp.asarray(g),
                        num_heads=4, node_mask=jnp.asarray(mask))
    h_hat = np.asarray(out.h_hat)
    # h_hat = clip(logits) + e, so |h_hat - e| <= 5
    np.testing.assert_array_less(np.abs(h_hat - e) - 1e-4, 5.0)


def test_random_masking_distribution():
    rng = np.random.default_rng(6)
    qkv, e, g, _ = make_inputs(rng, b=2, l=24)
    out = egt_attention(jnp.asarray(qkv), jnp.asarray(e), jnp.asarray(g),
                        num_heads=4, random_mask_prob=0.5, training=True,
                        rng=jax.random.PRNGKey(0))
    a = np.asarray(out.a_tild)
    # roughly half the attention entries should be (near) zero
    frac_zero = float((a < 1e-12).mean())
    assert 0.3 < frac_zero < 0.7


def test_split_qkv_layout():
    """The flat qkv axis factors as [3, d, h] (`egt_layers.py:69-76`)."""
    b, l, d, h = 1, 2, 3, 2
    x = np.arange(b * l * 3 * d * h, dtype=np.float32).reshape(b, l, 3 * d * h)
    q, k, v = split_qkv(jnp.asarray(x), h)
    assert q.shape == (b, l, d, h)
    np.testing.assert_allclose(np.asarray(q[0, 0]),
                               x[0, 0, : d * h].reshape(d, h))
    np.testing.assert_allclose(np.asarray(k[0, 0]),
                               x[0, 0, d * h: 2 * d * h].reshape(d, h))


def test_vpu_impl_matches_einsum():
    """attention_impl='vpu' computes the same op as the einsum path via
    elementwise/reduce chains (no MXU dots) — models/egt.py::_qk_logits_vpu,
    _av_vpu. On the CPU backend both paths are exact f32, so they agree to
    reassociation error."""
    rng = np.random.default_rng(7)
    qkv, e, g, mask = make_inputs(rng, b=3, l=14)
    kw = dict(num_heads=4, node_mask=jnp.asarray(mask), scale_degree=True,
              scaler_type="log")
    o_ein = egt_attention(jnp.asarray(qkv), jnp.asarray(e), jnp.asarray(g),
                          impl="einsum", **kw)
    o_vpu = egt_attention(jnp.asarray(qkv), jnp.asarray(e), jnp.asarray(g),
                          impl="vpu", **kw)
    np.testing.assert_allclose(np.asarray(o_vpu.h_hat),
                               np.asarray(o_ein.h_hat), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_vpu.a_tild),
                               np.asarray(o_ein.a_tild), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_vpu.v_att),
                               np.asarray(o_ein.v_att), atol=1e-5)


def test_vpu_impl_grads_match():
    def loss(qkv, e, g, impl):
        out = egt_attention(qkv, e, g, num_heads=4, impl=impl)
        return jnp.sum(out.v_att ** 2) + jnp.sum(out.h_hat ** 2)

    rng = np.random.default_rng(8)
    qkv, e, g, _ = make_inputs(rng, b=2, l=10)
    args = (jnp.asarray(qkv), jnp.asarray(e), jnp.asarray(g))
    g_ein = jax.grad(loss, argnums=(0, 1, 2))(*args, "einsum")
    g_vpu = jax.grad(loss, argnums=(0, 1, 2))(*args, "vpu")
    for a, b_ in zip(g_ein, g_vpu):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)
