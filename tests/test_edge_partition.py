"""Edge-partitioned (sequence-parallel) execution vs. single-device reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egt_tpu.models.graph_model import EGTGraphModel
from egt_tpu.parallel import mesh as meshlib
from egt_tpu.parallel.edge_partition import edge_partitioned_forward
from tests.test_model_forward import random_zinc_batch, small_cfg


def sp_mesh(n=4):
    return meshlib.make_mesh(n, model_parallel=n)


def test_graph_readout_matches():
    rng = np.random.default_rng(0)
    cfg = small_cfg(upto_hop=3)
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = random_zinc_batch(rng, l=16)  # 16 rows over 4 shards

    ref, _ = model.apply(params, batch)
    out = edge_partitioned_forward(model, params, batch, sp_mesh(4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_node_readout_matches():
    rng = np.random.default_rng(1)
    cfg = small_cfg(edge_input_kind="none", readout_kind="node", num_targets=2,
                    num_node_features=3, upto_hop=3)
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = random_zinc_batch(rng, l=16, nf=3)
    del batch["feature_matrix"]

    ref, _ = model.apply(params, batch)
    out = edge_partitioned_forward(model, params, batch, sp_mesh(4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_edge_readout_matches():
    rng = np.random.default_rng(2)
    b, l = 2, 16
    cfg = small_cfg(node_input_kind="dense", node_feature_dim=2,
                    edge_input_kind="dense", edge_feature_dim=1,
                    readout_kind="edge", num_targets=2, upto_hop=2)
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = {
        "node_features": rng.normal(size=(b, l, 2)).astype(np.float32),
        "feature_matrix": rng.normal(size=(b, l, l, 1)).astype(np.float32),
        "graph_matrix": (rng.random((b, l, l)) < 0.3).astype(np.float32),
    }
    ref, _ = model.apply(params, batch)
    out = edge_partitioned_forward(model, params, batch, sp_mesh(4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_edge_readout_pairwise_cat_matches():
    """TSP ablation readout (pairwise node concat) needs an h all-gather."""
    rng = np.random.default_rng(3)
    b, l = 2, 16
    cfg = small_cfg(node_input_kind="dense", node_feature_dim=2,
                    edge_input_kind="dense", edge_feature_dim=1,
                    readout_kind="edge", num_targets=2, upto_hop=2,
                    edge_channel_type="bias", use_node_embeddings=True)
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = {
        "node_features": rng.normal(size=(b, l, 2)).astype(np.float32),
        "feature_matrix": rng.normal(size=(b, l, l, 1)).astype(np.float32),
        "graph_matrix": (rng.random((b, l, l)) < 0.3).astype(np.float32),
    }
    ref, _ = model.apply(params, batch)
    out = edge_partitioned_forward(model, params, batch, sp_mesh(4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_xtalk_sp_matches():
    rng = np.random.default_rng(4)
    cfg = small_cfg(upto_hop=2, node2edge_xtalk=0.5, edge2node_xtalk=0.5)
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = random_zinc_batch(rng, l=16)
    ref, _ = model.apply(params, batch)
    out = edge_partitioned_forward(model, params, batch, sp_mesh(4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sp_gradients_match():
    """Training viability: grads through the sharded forward match single-device."""
    rng = np.random.default_rng(5)
    cfg = small_cfg(upto_hop=2)
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = random_zinc_batch(rng, l=16)
    mesh = sp_mesh(4)

    def loss_sp(p):
        out = edge_partitioned_forward(model, p, batch, mesh)
        return jnp.sum(out ** 2)

    def loss_ref(p):
        out, _ = model.apply(p, batch)
        return jnp.sum(out ** 2)

    g_sp = jax.grad(loss_sp)(params)
    g_ref = jax.grad(loss_ref)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_sp),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_virtual_nodes_sp_matches():
    """VN rows are replicated per shard; VN readout must match single-device."""
    rng = np.random.default_rng(6)
    cfg = small_cfg(num_virtual_nodes=2, upto_hop=2)
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = random_zinc_batch(rng, l=16)
    ref, _ = model.apply(params, batch)
    out = edge_partitioned_forward(model, params, batch, sp_mesh(4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_distance_loss_sp_matches():
    rng = np.random.default_rng(7)
    cfg = small_cfg(distance_loss=0.05, distance_target=3, upto_hop=2)
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = random_zinc_batch(rng, l=16)
    ref, _ = model.apply(params, batch)
    out = edge_partitioned_forward(model, params, batch, sp_mesh(4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_node2edge_embed_and_xpose_sp_match():
    rng = np.random.default_rng(8)
    cfg = small_cfg(node2edge_embed=True, include_xpose=True, upto_hop=3)
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = random_zinc_batch(rng, l=16)
    ref, _ = model.apply(params, batch)
    out = edge_partitioned_forward(model, params, batch, sp_mesh(4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_readout_edges_and_degree_enc_sp_match():
    rng = np.random.default_rng(9)
    cfg = small_cfg(readout_edges=True, max_degree_enc=4, max_diffuse_t=2,
                    upto_hop=2)
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = random_zinc_batch(rng, l=16)
    ref, _ = model.apply(params, batch)
    out = edge_partitioned_forward(model, params, batch, sp_mesh(4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_batch_norm_sp_matches():
    """Edge-stream BatchNorm statistics psum exactly across row shards."""
    rng = np.random.default_rng(10)
    cfg = small_cfg(node_normalization="batch", edge_normalization="batch",
                    upto_hop=2)
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = random_zinc_batch(rng, l=16)
    ref, _ = model.apply(params, batch, training=True,
                         rng=jax.random.PRNGKey(1))
    mesh = sp_mesh(4)
    from egt_tpu.parallel.edge_partition import edge_partitioned_forward as epf
    out = epf(model, params, batch, mesh, training=True,
              rng=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sp_unsupported_combination_raises():
    """The one genuinely incoherent combo: replicated VN rows under a psum'd
    edge-stream BatchNorm would be multiply-counted."""
    rng = np.random.default_rng(11)
    cfg = small_cfg(num_virtual_nodes=2, edge_normalization="batch")
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = random_zinc_batch(rng, l=16)
    with pytest.raises(NotImplementedError):
        edge_partitioned_forward(model, params, batch, sp_mesh(4),
                                 training=True, rng=jax.random.PRNGKey(0))
