"""Fused whole-layer Pallas kernel (interpret mode) vs the composed einsum path.

The kernel covers: edge pre-LN -> gates/edge-bias -> gated EGT attention ->
dense_edge_r + residual -> edge-FFN LN -> FFN + residual
(reference chain `lib/models/graph_xformer_model_base.py:192-223,309-324`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egt_tpu.models import egt
from egt_tpu.models.features import dense, dense_params
from egt_tpu.models.graph_model import GraphModelConfig
from egt_tpu.models.layers import activation, layer_norm
from egt_tpu.ops import fused_layer_pallas as flp


def make_cfg(**kw):
    defaults = dict(model_width=16, edge_width=8, num_heads=4, model_height=2,
                    node_input_kind="tokens", edge_input_kind="tokens",
                    num_node_features=28, num_edge_features=4,
                    readout_kind="graph", num_targets=1)
    defaults.update(kw)
    return GraphModelConfig(**defaults)


def make_params(key, cfg):
    ew, h, dh = cfg.edge_width, cfg.num_heads, cfg.model_width
    hidden = round(ew * cfg.ffn_multiplier)
    ks = jax.random.split(key, 8)

    def rand_ln(k, dim):
        k1, k2 = jax.random.split(k)
        return {"gamma": 1.0 + 0.1 * jax.random.normal(k1, (dim,)),
                "beta": 0.1 * jax.random.normal(k2, (dim,))}

    p = {
        "dense_edge_b": dense_params(ks[0], ew, h),
        "norm_edge": rand_ln(ks[1], ew),
        "dense_edge_r": dense_params(ks[2], h, ew),
        "edge_ffn": {"norm": rand_ln(ks[3], ew),
                     "lr1": dense_params(ks[4], ew, hidden),
                     "lr2": dense_params(ks[5], hidden, ew)},
    }
    if cfg.gate_attention:
        p["attention_gates"] = dense_params(ks[6], ew, h)
    # give the biases non-zero values so bias grads are load-bearing
    for sub in (p["dense_edge_b"], p["dense_edge_r"],
                p["edge_ffn"]["lr1"], p["edge_ffn"]["lr2"]):
        sub["bias"] = 0.1 * jax.random.normal(ks[7], sub["bias"].shape)
    return p


def ref_layer(p, cfg, e, qkv, node_mask, attn_mask, training=False, rng=None):
    """The unfused composition of the exact same math."""
    e_ln = layer_norm(p["norm_edge"], e)
    gates = dense(p["attention_gates"], e_ln) if cfg.gate_attention else None
    eb = activation(cfg.edge_activation, dense(p["dense_edge_b"], e_ln))
    am = None if attn_mask is None else attn_mask[..., None]
    out = egt.egt_attention(
        qkv, eb, gates, num_heads=cfg.num_heads, node_mask=node_mask,
        attn_mask=am,
        clip_logits_value=(tuple(cfg.clip_logits_value)
                           if cfg.clip_logits_value is not None else None),
        random_mask_prob=cfg.random_mask_prob, attn_dropout=cfg.attn_dropout,
        training=training, rng=rng)
    e_mid = dense(p["dense_edge_r"], out.h_hat) + e
    x = layer_norm(p["edge_ffn"]["norm"], e_mid)
    x = activation(cfg.activation, dense(p["edge_ffn"]["lr1"], x))
    e_out = dense(p["edge_ffn"]["lr2"], x) + e_mid
    return e_out, out.v_att


def make_inputs(key, cfg, b=3, l=12, masked=True):
    ks = jax.random.split(key, 4)
    e = jax.random.normal(ks[0], (b, l, l, cfg.edge_width))
    qkv = jax.random.normal(ks[1], (b, l, 3 * cfg.model_width))
    if masked:
        n = jax.random.randint(ks[2], (b,), 3, l + 1)
        node_mask = (jnp.arange(l)[None, :] < n[:, None]).astype(jnp.float32)
    else:
        node_mask = jnp.ones((b, l), jnp.float32)
    return e, qkv, node_mask


@pytest.mark.parametrize("gated", [True, False])
def test_fused_layer_forward(gated):
    cfg = make_cfg(gate_attention=gated)
    p = make_params(jax.random.PRNGKey(0), cfg)
    e, qkv, mask = make_inputs(jax.random.PRNGKey(1), cfg)

    e_ref, v_ref = ref_layer(p, cfg, e, qkv, mask, None)
    e_out, v_att = flp.fused_layer_apply(p, cfg, e, qkv, mask, None,
                                         training=False, rng=None)
    np.testing.assert_allclose(np.asarray(e_out), np.asarray(e_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_att), np.asarray(v_ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_layer_constrained():
    cfg = make_cfg(edge_channel_type="constrained")
    p = make_params(jax.random.PRNGKey(0), cfg)
    e, qkv, mask = make_inputs(jax.random.PRNGKey(1), cfg)
    b, l = mask.shape
    am = (jax.random.uniform(jax.random.PRNGKey(2), (b, l, l)) > 0.4)
    am = am.astype(jnp.float32)

    e_ref, v_ref = ref_layer(p, cfg, e, qkv, mask, am)
    e_out, v_att = flp.fused_layer_apply(p, cfg, e, qkv, mask, am,
                                         training=False, rng=None)
    np.testing.assert_allclose(np.asarray(e_out), np.asarray(e_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_att), np.asarray(v_ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_layer_wide_edges():
    """edge_width 64 -> pack p=2 at l=8."""
    cfg = make_cfg(edge_width=64, model_width=32, num_heads=8)
    p = make_params(jax.random.PRNGKey(0), cfg)
    e, qkv, mask = make_inputs(jax.random.PRNGKey(1), cfg, b=2, l=8)

    e_ref, v_ref = ref_layer(p, cfg, e, qkv, mask, None)
    e_out, v_att = flp.fused_layer_apply(p, cfg, e, qkv, mask, None,
                                         training=False, rng=None)
    np.testing.assert_allclose(np.asarray(e_out), np.asarray(e_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_att), np.asarray(v_ref),
                               rtol=1e-5, atol=1e-5)


def _loss_pair(p, cfg, e, qkv, mask, am):
    def loss_ref(p_, e_, qkv_):
        eo, vo = ref_layer(p_, cfg, e_, qkv_, mask, am)
        return (eo ** 2).sum() + (vo ** 2).sum()

    def loss_fused(p_, e_, qkv_):
        eo, vo = flp.fused_layer_apply(p_, cfg, e_, qkv_, mask, am,
                                       training=False, rng=None)
        return (eo ** 2).sum() + (vo ** 2).sum()

    return loss_ref, loss_fused


@pytest.mark.parametrize("gated", [True, False])
def test_fused_layer_grads(gated):
    cfg = make_cfg(gate_attention=gated)
    p = make_params(jax.random.PRNGKey(0), cfg)
    e, qkv, mask = make_inputs(jax.random.PRNGKey(1), cfg)
    loss_ref, loss_fused = _loss_pair(p, cfg, e, qkv, mask, None)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(p, e, qkv)
    g_fus = jax.grad(loss_fused, argnums=(0, 1, 2))(p, e, qkv)
    paths_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_f = jax.tree_util.tree_leaves(g_fus)
    for (path, a), b in zip(paths_r, flat_f):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_fused_layer_grads_inner_grid():
    """Force n_ib > 1 so the per-graph / per-weight accumulation paths run."""
    cfg = make_cfg()
    p = make_params(jax.random.PRNGKey(0), cfg)
    e, qkv, mask = make_inputs(jax.random.PRNGKey(1), cfg)
    old = flp._VMEM_BUDGET_ELEMS
    flp._VMEM_BUDGET_ELEMS = 7000   # forces bi=4 at this shape
    try:
        spec = flp.make_spec(cfg, 12, False)
        assert spec.bi < 12 and 12 % spec.bi == 0
        loss_ref, loss_fused = _loss_pair(p, cfg, e, qkv, mask, None)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(p, e, qkv)
        g_fus = jax.grad(loss_fused, argnums=(0, 1, 2))(p, e, qkv)
        for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g_fus)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=2e-4)
    finally:
        flp._VMEM_BUDGET_ELEMS = old


def test_fused_layer_stochastic_deterministic():
    """Same rng -> same draw (fwd and the recomputing bwd agree by seeding)."""
    cfg = make_cfg(random_mask_prob=0.2, attn_dropout=0.1)
    p = make_params(jax.random.PRNGKey(0), cfg)
    e, qkv, mask = make_inputs(jax.random.PRNGKey(1), cfg)
    rng = jax.random.PRNGKey(7)

    o1, v1 = flp.fused_layer_apply(p, cfg, e, qkv, mask, None,
                                   training=True, rng=rng)
    o2, v2 = flp.fused_layer_apply(p, cfg, e, qkv, mask, None,
                                   training=True, rng=rng)
    _, v3 = flp.fused_layer_apply(p, cfg, e, qkv, mask, None,
                                  training=True, rng=jax.random.PRNGKey(8))
    _, vd = flp.fused_layer_apply(p, cfg, e, qkv, mask, None,
                                  training=False, rng=None)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2))
    # e_out depends only on h_hat (pre-mask) so it is deterministic by design;
    # the stochastic draws show up in the value aggregation
    assert not np.allclose(np.asarray(v1), np.asarray(v3))
    assert not np.allclose(np.asarray(v1), np.asarray(vd))

    # gradients flow and are finite through the stochastic path
    def loss(p_):
        eo, vo = flp.fused_layer_apply(p_, cfg, e, qkv, mask, None,
                                       training=True, rng=rng)
        return (eo ** 2).sum() + (vo ** 2).sum()

    g = jax.grad(loss)(p)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_fused_layer_bf16():
    cfg = make_cfg()
    p = make_params(jax.random.PRNGKey(0), cfg)
    e, qkv, mask = make_inputs(jax.random.PRNGKey(1), cfg)
    e_ref, v_ref = ref_layer(p, cfg, e, qkv, mask, None)
    e_out, v_att = flp.fused_layer_apply(
        p, cfg, e.astype(jnp.bfloat16), qkv.astype(jnp.bfloat16), mask, None,
        training=False, rng=None)
    assert e_out.dtype == jnp.bfloat16 and v_att.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(e_out, np.float32),
                               np.asarray(e_ref), rtol=0.1, atol=0.1)
    np.testing.assert_allclose(np.asarray(v_att, np.float32),
                               np.asarray(v_ref), rtol=0.1, atol=0.1)


# ------------------------------------------------------------- full-model wiring


def _model_pair(**kw):
    from egt_tpu.models.graph_model import EGTGraphModel
    from tests.test_model_forward import random_zinc_batch, small_cfg
    rng = np.random.default_rng(11)
    batch = random_zinc_batch(rng, l=12)
    cfg_ref = small_cfg(**kw)
    cfg_fused = small_cfg(fused_layer=True, **kw)
    model_ref = EGTGraphModel(cfg_ref)
    model_fused = EGTGraphModel(cfg_fused)
    params = model_ref.init(jax.random.PRNGKey(0))
    return model_ref, model_fused, params, batch, cfg_fused


def test_model_fused_layer_matches():
    model_ref, model_fused, params, batch, cfg = _model_pair()
    assert flp.can_fuse_layer(cfg, False, None, False, 12)
    out_ref, _ = model_ref.apply(params, batch)
    out_fused, _ = model_fused.apply(params, batch)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)


def test_model_fused_layer_grads_match():
    model_ref, model_fused, params, batch, _ = _model_pair()

    def loss(model):
        def f(p):
            out, _ = model.apply(p, batch)
            return (out ** 2).sum()
        return f

    g_ref = jax.grad(loss(model_ref))(params)
    g_fus = jax.grad(loss(model_fused))(params)
    paths_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_f = jax.tree_util.tree_leaves(g_fus)
    for (path, a), b in zip(paths_r, flat_f):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_model_fused_layer_ineligible_falls_back():
    """Configs outside the kernel's envelope silently run the unfused path."""
    from tests.test_model_forward import small_cfg
    for kw in (dict(edge_channel_type="bias"),
               dict(add_n_norm=True),
               dict(node2edge_xtalk=0.5),
               dict(scale_degree=True, gate_attention=True),
               dict(combine_layer_repr=True)):
        cfg = small_cfg(fused_layer=True, **kw)
        assert not flp.can_fuse_layer(cfg, False, None, False, 12), kw
