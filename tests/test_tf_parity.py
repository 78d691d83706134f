"""Golden activation parity vs. the ACTUAL TensorFlow reference implementation.

Builds the reference Keras model from /root/reference (read-only import, used purely
as a numerical oracle), loads OUR parameters into it by layer name, feeds identical
batches, and requires allclose outputs. This is the strongest available evidence of
numerical parity (SURVEY.md §7.8).

Skipped automatically when TF or the reference checkout is unavailable.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available")


@pytest.fixture(scope="module")
def tf():
    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
    os.environ["CUDA_VISIBLE_DEVICES"] = "-1"
    tf = pytest.importorskip("tensorflow")
    # the reference imports a pre-TF-2.9 module path; shim it to the new location
    if "tensorflow.python.training.tracking.base" not in sys.modules:
        from tensorflow.python.trackable import base as _tb
        mod_tracking = types.ModuleType("tensorflow.python.training.tracking")
        mod_base = types.ModuleType("tensorflow.python.training.tracking.base")
        mod_base.no_automatic_dependency_tracking_scope = \
            _tb.no_automatic_dependency_tracking_scope
        mod_tracking.base = mod_base
        sys.modules["tensorflow.python.training.tracking"] = mod_tracking
        sys.modules["tensorflow.python.training.tracking.base"] = mod_base
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    return tf


# ------------------------------------------------------------------ weight mapping


def resolve_path(params, path):
    node = params
    for p in path:
        node = node[p]
    return node


def keras_name_to_path(name: str):
    """Map a reference weight name (e.g. 'dense_qkv_03/kernel') to our param path."""
    name = name.split(":")[0]
    layer, wname = name.split("/")
    wkey = {"embeddings": "table", "kernel": "kernel", "bias": "bias",
            "gamma": "gamma", "beta": "beta",
            "virtual_node_embeddings": "virtual_node_embeddings",
            "virtual_edge_embeddings": "virtual_edge_embeddings"}[wname]

    statics = {
        "node_emb": ("node_emb",),
        "svd_emb": ("svd_emb",),
        "eig_emb": ("eig_emb",),
        "adj_emb": ("adj_emb",),
        "fm_emb": ("fm_emb",),
        "edge_emb": ("fm_emb",),          # dense-feature datasets name it edge_emb
        "node2edge_emb": ("node2edge_emb",),
        "virtual_node_embedding": (),
        "virtual_edge_embedding": (),
        "node_norm_final": ("stack", "node_norm_final"),
        "edge_norm_final": ("stack", "edge_norm_final"),
        "target": ("target",),
        "distance_target": ("distance_head", "distance_target"),
    }
    if layer in statics:
        return statics[layer] + (wkey,)
    if layer.startswith("mlp_out_dist_targ_"):
        idx = int(layer.rsplit("_", 1)[1])
        return ("distance_head", "mlp", "dense", idx, wkey)
    if layer.startswith("mlp_out_"):
        idx = int(layer.rsplit("_", 1)[1])
        return ("mlp_out", "dense", idx, wkey)

    # per-layer names end with the 2-digit tag
    tag = layer.rsplit("_", 1)[1]
    i = int(tag)
    stem = layer[: -(len(tag) + 1)]
    per_layer = {
        "norm_mha": ("norm_mha",),
        "norm_edge": ("norm_edge",),
        "dense_qkv": ("dense_qkv",),
        "dense_mha": ("dense_mha",),
        "dense_edge_b": ("dense_edge_b",),
        "attention_gates": ("attention_gates",),
        "dense_edge_r": ("dense_edge_r",),
        "norm_fnn_node": ("node_ffn", "norm"),
        "fnn_lr1_node": ("node_ffn", "lr1"),
        "fnn_lr2_node": ("node_ffn", "lr2"),
        "norm_fnn_edge": ("edge_ffn", "norm"),
        "fnn_lr1_edge": ("edge_ffn", "lr1"),
        "fnn_lr2_edge": ("edge_ffn", "lr2"),
    }
    if stem in per_layer:
        return ("stack", "layers", i) + per_layer[stem] + (wkey,)
    raise KeyError(f"unmapped reference weight {name!r}")


def load_params_into_keras(model, params):
    for w in model.weights:
        if w.name.endswith("multiplier:0"):
            continue  # SparseXEntropy loss multiplier: static config on our side
        path = keras_name_to_path(w.name)
        if not path[:-1]:  # virtual node/edge embeddings sit at top level
            val = resolve_path(params, (w.name.split("/")[1].split(":")[0],))
        else:
            val = resolve_path(params, path)
        val = np.asarray(val)
        assert tuple(w.shape) == val.shape, (w.name, w.shape, val.shape)
        w.assign(val)


# ----------------------------------------------------------------------- fixtures


def zinc_like_batch(rng, b=4, l=12, svd_k=8):
    from tests.test_model_forward import random_zinc_batch
    batch = random_zinc_batch(rng, b=b, l=l, pe="svd", k=svd_k)
    return batch


def my_model_and_params(**kw):
    import jax
    from egt_tpu.models.graph_model import EGTGraphModel, GraphModelConfig

    defaults = dict(
        model_width=16, edge_width=8, num_heads=4, model_height=2,
        node_input_kind="tokens", edge_input_kind="tokens",
        num_node_features=28, num_edge_features=4, num_targets=1,
        readout_kind="graph", upto_hop=2, max_length=12,
        use_svd=True, num_svd_features=8, sel_svd_features=4,
        transform_svd=True, random_neg=False, mlp_layers=(0.5, 0.25))
    defaults.update(kw)
    cfg = GraphModelConfig(**defaults)
    model = EGTGraphModel(cfg)
    return model, model.init(jax.random.PRNGKey(0))


REF_COMMON = dict(max_length=12, model_width=16, edge_width=8, num_heads=4,
                  model_height=2, upto_hop=2, use_svd=True, num_svd_features=8,
                  sel_svd_features=4, transform_svd=True, random_neg=False,
                  mlp_layers=[0.5, 0.25], num_virtual_nodes=0)


def run_reference(tf, ref_model, batch, input_names):
    feeds = [np.asarray(batch[n], np.float32) for n in input_names]
    return np.asarray(ref_model(feeds, training=False))


# -------------------------------------------------------------------------- tests


@pytest.mark.parametrize("variant", ["residual", "bias", "constrained",
                                     "ungated"])
def test_zinc_model_parity(tf, variant):
    from lib.models.zinc.dc import DCSVDTransformer

    kw = {}
    ref_kw = dict(REF_COMMON)
    if variant == "bias":
        kw["edge_channel_type"] = ref_kw["edge_channel_type"] = "bias"
    elif variant == "constrained":
        kw["edge_channel_type"] = ref_kw["edge_channel_type"] = "constrained"
    elif variant == "ungated":
        kw["gate_attention"] = ref_kw["gate_attention"] = False

    model, params = my_model_and_params(**kw)
    ref_model = DCSVDTransformer(**ref_kw).get_model()
    load_params_into_keras(ref_model, params)

    rng = np.random.default_rng(0)
    batch = zinc_like_batch(rng)
    ref_out = run_reference(tf, ref_model, batch,
                            [t.name.split(":")[0] for t in ref_model.inputs])
    my_out, _ = model.apply(params, batch)
    np.testing.assert_allclose(np.asarray(my_out), ref_out, rtol=1e-4,
                               atol=1e-4)


def test_zinc_virtual_nodes_parity(tf):
    from lib.models.zinc.dc import DCSVDTransformer

    model, params = my_model_and_params(num_virtual_nodes=2)
    ref_kw = dict(REF_COMMON, num_virtual_nodes=2)
    ref_model = DCSVDTransformer(**ref_kw).get_model()
    load_params_into_keras(ref_model, params)

    rng = np.random.default_rng(1)
    batch = zinc_like_batch(rng)
    ref_out = run_reference(tf, ref_model, batch,
                            [t.name.split(":")[0] for t in ref_model.inputs])
    my_out, _ = model.apply(params, batch)
    np.testing.assert_allclose(np.asarray(my_out), ref_out, rtol=1e-4,
                               atol=1e-4)


def test_zinc_distance_loss_parity(tf):
    """Distance-objective auxiliary loss value must match the reference layer."""
    from lib.models.zinc.dc import DCSVDTransformer

    model, params = my_model_and_params(distance_loss=0.05, distance_target=3)
    ref_kw = dict(REF_COMMON, distance_loss=0.05, distance_target=3)
    ref_model = DCSVDTransformer(**ref_kw).get_model()
    load_params_into_keras(ref_model, params)

    rng = np.random.default_rng(2)
    batch = zinc_like_batch(rng)
    feeds = [np.asarray(batch[t.name.split(":")[0]], np.float32)
             for t in ref_model.inputs]
    ref_out = ref_model(feeds, training=False)
    ref_losses = [float(x) for x in ref_model.losses]

    my_out, ctx = model.apply(params, batch)
    np.testing.assert_allclose(np.asarray(my_out), np.asarray(ref_out),
                               rtol=1e-4, atol=1e-4)
    assert ref_losses, "reference model should expose the distance add_loss"
    np.testing.assert_allclose(float(ctx.losses["distance_loss"]),
                               sum(ref_losses), rtol=1e-4, atol=1e-5)


def test_pattern_model_parity(tf):
    from lib.models.sbm_pattern.dc import DCSVDTransformer

    model, params = my_model_and_params(
        edge_input_kind="none", readout_kind="node",
        num_node_features=3, num_targets=2)
    ref_kw = dict(REF_COMMON)
    ref_model = DCSVDTransformer(num_node_features=3, num_target_labels=2,
                                 **ref_kw).get_model()
    load_params_into_keras(ref_model, params)

    rng = np.random.default_rng(3)
    batch = zinc_like_batch(rng)
    batch["node_features"] = np.where(batch["node_features"] >= 0,
                                      batch["node_features"] % 3, -1)
    del batch["feature_matrix"]
    ref_out = run_reference(tf, ref_model, batch,
                            [t.name.split(":")[0] for t in ref_model.inputs])
    my_out, _ = model.apply(params, batch)
    # compare only valid node rows (padded rows differ by masking convention)
    valid = batch["node_features"] >= 0
    np.testing.assert_allclose(np.asarray(my_out)[valid], ref_out[valid],
                               rtol=1e-4, atol=1e-4)


def test_tsp_model_parity(tf):
    from lib.models.tsp.dc import DCSVDTransformer

    b, l = 3, 12
    model, params = my_model_and_params(
        node_input_kind="dense", node_feature_dim=2,
        edge_input_kind="dense", edge_feature_dim=1,
        readout_kind="edge", num_targets=2)
    ref_kw = dict(REF_COMMON)
    ref_model = DCSVDTransformer(**ref_kw).get_model()
    load_params_into_keras(ref_model, params)

    rng = np.random.default_rng(4)
    batch = zinc_like_batch(rng, b=b, l=l)
    # dense float features with -1 mask padding
    nf = np.full((b, l, 2), -1.0, np.float32)
    fm = np.full((b, l, l, 1), -1.0, np.float32)
    valid = batch["node_features"] >= 0
    for i in range(b):
        n = valid[i].sum()
        nf[i, :n] = rng.random((n, 2))
        fm[i, :n, :n, 0] = rng.random((n, n))
    batch["node_features"] = nf
    batch["feature_matrix"] = fm
    ref_out = run_reference(tf, ref_model, batch,
                            [t.name.split(":")[0] for t in ref_model.inputs])
    my_out, _ = model.apply(params, batch)
    grid_valid = valid[:, :, None] & valid[:, None, :]
    np.testing.assert_allclose(np.asarray(my_out)[grid_valid],
                               ref_out[grid_valid], rtol=1e-4, atol=1e-4)


def test_zinc_eig_parity(tf):
    from lib.models.zinc.dc import DCEigTransformer

    model, params = my_model_and_params(
        use_svd=False, use_eig=True, num_eig_features=8, sel_eig_features=4,
        transform_eig=False)
    ref_kw = dict(REF_COMMON)
    ref_kw.pop("use_svd"); ref_kw.pop("num_svd_features")
    ref_kw.pop("sel_svd_features"); ref_kw.pop("transform_svd")
    ref_model = DCEigTransformer(use_eig=True, num_eig_features=8,
                                 sel_eig_features=4, transform_eig=False,
                                 **ref_kw).get_model()
    load_params_into_keras(ref_model, params)

    rng = np.random.default_rng(5)
    from tests.test_model_forward import random_zinc_batch
    batch = random_zinc_batch(rng, pe="eig", k=8)
    ref_out = run_reference(tf, ref_model, batch,
                            [t.name.split(":")[0] for t in ref_model.inputs])
    my_out, _ = model.apply(params, batch)
    np.testing.assert_allclose(np.asarray(my_out), ref_out, rtol=1e-4,
                               atol=1e-4)


def test_zinc_node2edge_embed_parity(tf):
    from lib.models.zinc.dc import DCSVDTransformer

    model, params = my_model_and_params(node2edge_embed=True)
    ref_model = DCSVDTransformer(node2edge_embed=True,
                                 **REF_COMMON).get_model()
    load_params_into_keras(ref_model, params)
    rng = np.random.default_rng(6)
    batch = zinc_like_batch(rng)
    ref_out = run_reference(tf, ref_model, batch,
                            [t.name.split(":")[0] for t in ref_model.inputs])
    my_out, _ = model.apply(params, batch)
    np.testing.assert_allclose(np.asarray(my_out), ref_out, rtol=1e-4,
                               atol=1e-4)


def test_mnist_model_parity(tf):
    from lib.models.mnist.dc import DCSVDTransformer

    b, l = 3, 12
    model, params = my_model_and_params(
        node_input_kind="dense", node_feature_dim=3,
        edge_input_kind="dense", edge_feature_dim=1,
        readout_kind="graph", num_targets=10)
    ref_model = DCSVDTransformer(num_node_features=3, num_edge_features=1,
                                 num_target_labels=10,
                                 **REF_COMMON).get_model()
    load_params_into_keras(ref_model, params)

    rng = np.random.default_rng(7)
    batch = zinc_like_batch(rng, b=b, l=l)
    valid = batch["node_features"] >= 0
    nf = np.full((b, l, 3), -1.0, np.float32)
    fm = np.full((b, l, l, 1), -1.0, np.float32)
    for i in range(b):
        n = valid[i].sum()
        nf[i, :n] = rng.random((n, 3))
        fm[i, :n, :n, 0] = rng.random((n, n))
    batch["node_features"] = nf
    batch["feature_matrix"] = fm
    ref_out = run_reference(tf, ref_model, batch,
                            [t.name.split(":")[0] for t in ref_model.inputs])
    my_out, _ = model.apply(params, batch)
    np.testing.assert_allclose(np.asarray(my_out), ref_out, rtol=1e-4,
                               atol=1e-4)


def test_xtalk_parity(tf):
    """Node<->edge FFN cross-talk against the reference Lambda implementation."""
    from lib.models.zinc.dc import DCSVDTransformer

    model, params = my_model_and_params(node2edge_xtalk=0.5,
                                        edge2node_xtalk=0.5)
    ref_model = DCSVDTransformer(node2edge_xtalk=0.5, edge2node_xtalk=0.5,
                                 **REF_COMMON).get_model()
    load_params_into_keras(ref_model, params)
    rng = np.random.default_rng(8)
    batch = zinc_like_batch(rng)
    ref_out = run_reference(tf, ref_model, batch,
                            [t.name.split(":")[0] for t in ref_model.inputs])
    my_out, _ = model.apply(params, batch)
    np.testing.assert_allclose(np.asarray(my_out), ref_out, rtol=1e-4,
                               atol=1e-4)


def test_add_n_norm_parity(tf):
    """Post-norm (add_n_norm=True) layer arrangement."""
    from lib.models.zinc.dc import DCSVDTransformer

    model, params = my_model_and_params(add_n_norm=True)
    ref_model = DCSVDTransformer(add_n_norm=True, **REF_COMMON).get_model()
    load_params_into_keras(ref_model, params)
    rng = np.random.default_rng(9)
    batch = zinc_like_batch(rng)
    ref_out = run_reference(tf, ref_model, batch,
                            [t.name.split(":")[0] for t in ref_model.inputs])
    my_out, _ = model.apply(params, batch)
    np.testing.assert_allclose(np.asarray(my_out), ref_out, rtol=1e-4,
                               atol=1e-4)


def test_scale_degree_parity(tf):
    from lib.models.zinc.dc import DCSVDTransformer

    model, params = my_model_and_params(scale_degree=True, scaler_type="log")
    ref_model = DCSVDTransformer(scale_degree=True, scaler_type="log",
                                 **REF_COMMON).get_model()
    load_params_into_keras(ref_model, params)
    rng = np.random.default_rng(10)
    batch = zinc_like_batch(rng)
    ref_out = run_reference(tf, ref_model, batch,
                            [t.name.split(":")[0] for t in ref_model.inputs])
    my_out, _ = model.apply(params, batch)
    np.testing.assert_allclose(np.asarray(my_out), ref_out, rtol=1e-4,
                               atol=1e-4)


def test_gradient_parity(tf):
    """Backward-pass parity: gradients of the MAE loss w.r.t. every weight match
    the reference model's GradientTape gradients on the same params and batch."""
    import jax
    import jax.numpy as jnp
    from lib.models.zinc.dc import DCSVDTransformer

    model, params = my_model_and_params()
    ref_model = DCSVDTransformer(**REF_COMMON).get_model()
    load_params_into_keras(ref_model, params)

    rng = np.random.default_rng(11)
    batch = zinc_like_batch(rng)
    target = rng.normal(size=(4, 1)).astype(np.float32)

    # --- reference gradients
    feeds = [tf.constant(np.asarray(batch[t.name.split(":")[0]], np.float32))
             for t in ref_model.inputs]
    with tf.GradientTape() as tape:
        out = ref_model(feeds, training=False)
        loss = tf.reduce_mean(tf.abs(out - target))
    ref_grads = tape.gradient(loss, ref_model.trainable_weights)
    ref_by_name = {}
    for w, g in zip(ref_model.trainable_weights, ref_grads):
        if isinstance(g, tf.IndexedSlices):  # embedding grads come back sparse
            g = tf.math.unsorted_segment_sum(g.values, g.indices,
                                             g.dense_shape[0])
        ref_by_name[w.name] = np.asarray(g)

    # --- our gradients
    def loss_fn(p):
        out, _ = model.apply(p, batch)
        return jnp.mean(jnp.abs(out - target))

    my_loss = float(loss_fn(params))
    my_grads = jax.grad(loss_fn)(params)

    np.testing.assert_allclose(my_loss, float(loss), rtol=1e-5, atol=1e-6)

    n_checked = 0
    for name, g_ref in ref_by_name.items():
        path = keras_name_to_path(name)
        g_mine = np.asarray(resolve_path(my_grads, path))
        np.testing.assert_allclose(g_mine, g_ref, rtol=5e-4, atol=1e-5,
                                   err_msg=name)
        n_checked += 1
    assert n_checked == len(ref_model.trainable_weights)


def test_training_trajectory_parity(tf):
    """20 Adam steps on a fixed batch: the loss trajectories of the two
    frameworks must track (same params, same data, same optimizer config)."""
    import jax
    import jax.numpy as jnp
    import optax
    from lib.models.zinc.dc import DCSVDTransformer

    from egt_tpu.training import optim as my_optim

    model, params = my_model_and_params()
    ref_model = DCSVDTransformer(**REF_COMMON).get_model()
    load_params_into_keras(ref_model, params)

    rng = np.random.default_rng(12)
    batch = zinc_like_batch(rng)
    target = rng.normal(size=(4, 1)).astype(np.float32)
    lr = 1e-3

    # --- reference: manual GradientTape + Keras Adam
    ref_opt = tf.keras.optimizers.Adam(learning_rate=lr)
    feeds = [tf.constant(np.asarray(batch[t.name.split(":")[0]], np.float32))
             for t in ref_model.inputs]
    ref_losses = []
    for _ in range(20):
        with tf.GradientTape() as tape:
            out = ref_model(feeds, training=False)  # no stochasticity
            loss = tf.reduce_mean(tf.abs(out - target))
        grads = tape.gradient(loss, ref_model.trainable_weights)
        ref_opt.apply_gradients(zip(grads, ref_model.trainable_weights))
        ref_losses.append(float(loss))

    # --- ours: optax Adam (Keras-matching eps)
    optimizer = my_optim.make_optimizer("adam", lr, params=params)
    opt_state = optimizer.init(params)

    def loss_fn(p):
        out, _ = model.apply(p, batch)
        return jnp.mean(jnp.abs(out - target))

    @jax.jit
    def step(p, o):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    my_losses = []
    p, o = params, opt_state
    for _ in range(20):
        p, o, loss = step(p, o)
        my_losses.append(float(loss))

    np.testing.assert_allclose(my_losses, ref_losses, rtol=2e-3, atol=2e-4)
    assert my_losses[-1] < my_losses[0]  # it actually optimizes
