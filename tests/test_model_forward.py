"""Forward-pass shape/sanity tests for the full model across task variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egt_tpu.models.graph_model import EGTGraphModel, GraphModelConfig


def random_zinc_batch(rng, b=4, l=12, nf=28, ef=4, pe=None, k=8):
    num_nodes = rng.integers(4, l + 1, size=b)
    nodef = np.full((b, l), -1, np.int32)
    fmat = np.full((b, l, l), -1, np.int32)
    adj = np.zeros((b, l, l), np.float32)
    for i, n in enumerate(num_nodes):
        nodef[i, :n] = rng.integers(0, nf, size=n)
        n_edges = max(1, 2 * n)
        src = rng.integers(0, n, size=n_edges)
        dst = (src + 1 + rng.integers(0, max(n - 1, 1), size=n_edges)) % n  # no self loops
        adj[i, src, dst] = 1.0
        adj[i, np.arange(n), np.arange(n)] += 1.0
        fmat[i, src, dst] = rng.integers(0, ef, size=n_edges)
    batch = {
        "node_features": nodef,
        "feature_matrix": fmat,
        "graph_matrix": adj,
        "target": rng.normal(size=(b, 1)).astype(np.float32),
        "sample_mask": np.ones((b,), np.float32),
    }
    if pe == "svd":
        batch["singular_vectors"] = rng.normal(size=(b, l, k, 2)).astype(np.float32)
    elif pe == "eig":
        batch["eigen_vectors"] = rng.normal(size=(b, l, k)).astype(np.float32)
    return batch


def small_cfg(**kw):
    defaults = dict(model_width=16, edge_width=8, num_heads=4, model_height=2,
                    node_input_kind="tokens", edge_input_kind="tokens",
                    num_node_features=28, num_edge_features=4,
                    readout_kind="graph", num_targets=1, upto_hop=2)
    defaults.update(kw)
    return GraphModelConfig(**defaults)


@pytest.mark.parametrize("edge_channel_type", ["residual", "bias", "constrained", "none"])
@pytest.mark.parametrize("gate_attention", [True, False])
def test_forward_variants(edge_channel_type, gate_attention):
    rng = np.random.default_rng(0)
    cfg = small_cfg(edge_channel_type=edge_channel_type,
                    gate_attention=gate_attention)
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = random_zinc_batch(rng)
    out, ctx = model.apply(params, batch)
    assert out.shape == (4, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_forward_training_stochastic():
    rng = np.random.default_rng(0)
    cfg = small_cfg(random_mask_prob=0.1, attn_dropout=0.1, node_dropout=0.1,
                    edge_dropout=0.1)
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = random_zinc_batch(rng)
    out1, _ = model.apply(params, batch, training=True, rng=jax.random.PRNGKey(1))
    out2, _ = model.apply(params, batch, training=True, rng=jax.random.PRNGKey(2))
    out1d, _ = model.apply(params, batch, training=True, rng=jax.random.PRNGKey(1))
    assert not np.allclose(out1, out2)          # different rng -> different output
    np.testing.assert_allclose(out1, out1d)     # same rng -> deterministic


def test_forward_svd_vn_distance():
    rng = np.random.default_rng(0)
    cfg = small_cfg(use_svd=True, num_svd_features=8, sel_svd_features=4,
                    transform_svd=True, random_neg=True,
                    num_virtual_nodes=2, distance_loss=0.05, distance_target=3,
                    scale_degree=True)
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = random_zinc_batch(rng, pe="svd", k=8)
    out, ctx = model.apply(params, batch, training=True, rng=jax.random.PRNGKey(1))
    assert out.shape == (4, 1)
    assert "distance_loss" in ctx.losses
    assert np.isfinite(float(ctx.losses["distance_loss"]))


def test_forward_node_and_edge_readouts():
    rng = np.random.default_rng(0)
    # node-level (PATTERN-like): no edge features
    cfg = small_cfg(edge_input_kind="none", readout_kind="node", num_targets=2,
                    num_node_features=3)
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = random_zinc_batch(rng, nf=3)
    del batch["feature_matrix"]
    out, _ = model.apply(params, batch)
    assert out.shape == (4, 12, 2)

    # edge-level (TSP-like): dense features
    cfg = small_cfg(node_input_kind="dense", node_feature_dim=2,
                    edge_input_kind="dense", edge_feature_dim=1,
                    readout_kind="edge", num_targets=2)
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    b, l = 4, 12
    batch = {
        "node_features": rng.normal(size=(b, l, 2)).astype(np.float32),
        "feature_matrix": rng.normal(size=(b, l, l, 1)).astype(np.float32),
        "graph_matrix": (rng.random((b, l, l)) < 0.3).astype(np.float32),
    }
    out, _ = model.apply(params, batch)
    assert out.shape == (4, 12, 12, 2)

    # TSP ablation readout via pairwise node concat
    cfg2 = small_cfg(node_input_kind="dense", node_feature_dim=2,
                     edge_input_kind="dense", edge_feature_dim=1,
                     readout_kind="edge", num_targets=2,
                     edge_channel_type="bias", use_node_embeddings=True)
    model2 = EGTGraphModel(cfg2)
    params2 = model2.init(jax.random.PRNGKey(0))
    out2, _ = model2.apply(params2, batch)
    assert out2.shape == (4, 12, 12, 2)


def test_xtalk_and_postnorm():
    rng = np.random.default_rng(0)
    cfg = small_cfg(node2edge_xtalk=0.5, edge2node_xtalk=0.5)
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = random_zinc_batch(rng)
    out, _ = model.apply(params, batch)
    assert out.shape == (4, 1)

    cfg = small_cfg(add_n_norm=True)
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    out, _ = model.apply(params, batch)
    assert out.shape == (4, 1)


def test_batch_norm_variant():
    rng = np.random.default_rng(0)
    cfg = small_cfg(node_normalization="batch", edge_normalization="batch")
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = random_zinc_batch(rng)
    out, ctx = model.apply(params, batch, training=True, rng=jax.random.PRNGKey(1))
    assert out.shape == (4, 1)
    assert len(ctx.stats_updates) > 0  # moving stats were collected
    out_eval, ctx_eval = model.apply(params, batch, training=False)
    assert len(ctx_eval.stats_updates) == 0


def test_jit_compilation():
    rng = np.random.default_rng(0)
    cfg = small_cfg()
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = random_zinc_batch(rng)

    @jax.jit
    def fwd(p, b):
        out, _ = model.apply(p, b)
        return out

    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    out = fwd(params, jb)
    out_ref, _ = model.apply(params, batch)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)
