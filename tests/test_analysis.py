"""Analysis-capture subsystem tests (reference: lib/models/analysis.py)."""

import jax
import numpy as np

from egt_tpu.models.graph_model import EGTGraphModel
from egt_tpu.training.results import save_results
from tests.test_model_forward import random_zinc_batch, small_cfg


def test_analysis_capture_keys_and_shapes():
    rng = np.random.default_rng(0)
    cfg = small_cfg()  # height=2, heads=4
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = random_zinc_batch(rng)

    analysis = model.analyze(params, batch)
    b, l, h = 4, 12, 4
    for i in range(cfg.model_height):
        tag = f"{i:0>2d}"
        assert analysis[f"mha_{tag}/e"].shape == (b, l, l, h)     # h_hat
        assert analysis[f"mha_{tag}/mat"].shape == (b, l, l, h)   # a_tild
        assert analysis[f"attention_gates_{tag}/gates"].shape == (b, l, l, h)
        assert analysis[f"dense_edge_b_{tag}/e"].shape == (b, l, l, h)

    # attention rows over valid keys sum to <= 1 (gated) and are non-negative
    mat = np.asarray(analysis["mha_00/mat"])
    assert (mat >= 0).all()


def test_analysis_consistent_with_forward():
    """Capture must not perturb the forward output."""
    rng = np.random.default_rng(1)
    model = EGTGraphModel(small_cfg())
    params = model.init(jax.random.PRNGKey(0))
    batch = random_zinc_batch(rng)
    out_plain, _ = model.apply(params, batch)
    out_cap, ctx = model.apply(params, batch, capture_analysis=True)
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_cap))
    assert ctx.analysis


def test_combine_layer_repr():
    rng = np.random.default_rng(2)
    model = EGTGraphModel(small_cfg(combine_layer_repr=True))
    params = model.init(jax.random.PRNGKey(0))
    batch = random_zinc_batch(rng)
    _, ctx = model.apply(params, batch)
    assert len(ctx.analysis["all_node_repr"]) == 2


def test_results_saver(tmp_path):
    p = save_results("zinc", "tiny", "testset", {"mae": 0.1},
                     configs={"a": 1}, state={"current_epoch": 3},
                     parent_dir=str(tmp_path))
    import json
    rec = json.load(open(p))
    assert rec["metrics"]["mae"] == 0.1
    assert rec["state"]["current_epoch"] == 3
