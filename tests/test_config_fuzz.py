"""Config-interaction fuzz: random valid GraphModelConfigs must produce finite
forward outputs and gradients.

The model surface is ~45 interacting knobs (edge-channel variants x norms x PEs x
VN x readouts x xtalk x ...); pairwise tests cannot cover the cross products, so
this samples the space with a fixed seed (deterministic in CI) and checks basic
health end-to-end through init/apply/grad.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egt_tpu.models.graph_model import EGTGraphModel, GraphModelConfig
from tests.test_model_forward import random_zinc_batch

N_CASES = 24


def sample_cfg(rng):
    edge_channel = rng.choice(["residual", "bias", "constrained", "none"])
    gate = bool(rng.random() < 0.7)
    readout = rng.choice(["graph", "node", "edge"])
    if readout == "edge" and edge_channel == "none":
        edge_channel = "residual"
    kw = dict(
        model_width=16, edge_width=8,
        num_heads=int(rng.choice([2, 4])),
        model_height=int(rng.integers(1, 3)),
        node_input_kind="tokens", edge_input_kind="tokens",
        num_node_features=28, num_edge_features=4,
        readout_kind=str(readout), num_targets=int(rng.integers(1, 4)),
        edge_channel_type=str(edge_channel),
        gate_attention=gate,
        scale_degree=bool(gate and edge_channel != "none"
                          and rng.random() < 0.4),
        scaler_type=str(rng.choice(["log", "linear"])),
        add_n_norm=bool(rng.random() < 0.3),
        node_normalization=str(rng.choice(["layer", "batch"])),
        edge_normalization=str(rng.choice(["layer", "batch"])),
        upto_hop=int(rng.integers(1, 4)),
        include_xpose=bool(rng.random() < 0.2),
        clip_hops=bool(rng.random() < 0.8),
        num_virtual_nodes=int(rng.choice([0, 0, 1, 2])),
        random_mask_prob=float(rng.choice([0.0, 0.1])),
        attn_dropout=float(rng.choice([0.0, 0.1])),
        node_dropout=float(rng.choice([0.0, 0.1])),
        edge_dropout=float(rng.choice([0.0, 0.1])),
        edge_activation=str(rng.choice(["none", "elu", "lrelu2"])),
        ffn_multiplier=float(rng.choice([1.0, 2.0])),
        mlp_layers=[(0.5,), (0.5, 0.25)][int(rng.integers(0, 2))],
        use_svd=bool(rng.random() < 0.4),
        num_svd_features=8, sel_svd_features=4,
        transform_svd=bool(rng.random() < 0.5),
        random_neg=bool(rng.random() < 0.5),
        max_degree_enc=int(rng.choice([0, 0, 3])),
        bidir_degree=bool(rng.random() < 0.5),
        distance_loss=float(rng.choice([0.0, 0.0, 0.05])),
        distance_target=3,
        max_diffuse_t=int(rng.choice([0, 0, 2])),
        node2edge_embed=bool(rng.random() < 0.2),
        readout_edges=bool(readout == "graph" and rng.random() < 0.2),
        use_node_embeddings=bool(readout == "edge" and rng.random() < 0.3),
        fused_edge_block=bool(rng.random() < 0.2),
        remat=bool(rng.random() < 0.2),
        compute_dtype=str(rng.choice(["float32", "float32", "bfloat16"])),
    )
    if kw["edge_activation"] == "none":
        kw["edge_activation"] = None
    if kw["edge_channel_type"] in ("residual", "constrained"):
        if rng.random() < 0.3:
            kw["node2edge_xtalk"] = 0.5
            kw["edge2node_xtalk"] = 0.5
    if kw["max_diffuse_t"] or kw["node2edge_embed"] or kw["readout_edges"]:
        kw["edge_input_kind"] = "tokens"  # needs a feature matrix
    if readout == "edge":
        # the distance head replaces e with its logits before the readout —
        # dimensionally broken in the reference too; excluded combination
        kw["distance_loss"] = 0.0
    return kw


@pytest.mark.parametrize("case", range(N_CASES))
def test_random_config_health(case):
    rng = np.random.default_rng(1234 + case)
    kw = sample_cfg(rng)
    cfg = GraphModelConfig(**kw)
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(case))
    batch = random_zinc_batch(rng, b=3, l=10, pe="svd" if cfg.use_svd else None,
                              k=8)

    out, ctx = model.apply(params, batch, training=True,
                           rng=jax.random.PRNGKey(case + 1))
    assert np.all(np.isfinite(np.asarray(out, dtype=np.float32))), kw
    for v in ctx.losses.values():
        assert np.isfinite(float(v)), kw

    def loss(p):
        o, c = model.apply(p, batch, training=True,
                           rng=jax.random.PRNGKey(case + 1))
        total = jnp.sum(o.astype(jnp.float32) ** 2)
        for v in c.losses.values():
            total = total + v
        return total

    grads = jax.grad(loss)(params)
    for path, g in jax.tree_util.tree_flatten_with_path(grads)[0]:
        assert np.all(np.isfinite(np.asarray(g, dtype=np.float32))), (kw, path)

    # eval path is deterministic
    o1, _ = model.apply(params, batch)
    o2, _ = model.apply(params, batch)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
