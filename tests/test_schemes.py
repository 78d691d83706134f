"""Scheme coverage: every registered scheme builds, and node/edge-level task schemes
train + evaluate end-to-end on synthetic data."""

import pytest

from egt_tpu.training.schemes import available_schemes, import_scheme
from tests.synth import make_mnist_like, make_pattern_like, make_tsp_like


def test_registry_complete():
    names = available_schemes()
    for expected in ["zinc.svd", "zinc.eig", "zinc_full.svd", "zinc_full.eig",
                     "pattern.svd", "pattern.eig", "cluster.svd", "cluster.eig",
                     "mnist.svd", "cifar10.svd", "tsp.svd"]:
        assert expected in names


@pytest.mark.parametrize("name", ["zinc.svd", "zinc.eig", "pattern.svd",
                                  "cluster.eig", "mnist.svd", "cifar10.svd",
                                  "tsp.svd"])
def test_scheme_configs_resolve(name):
    scheme = import_scheme(name)({})
    cfg = scheme.config.resolved()
    assert cfg["dataset_name"]
    mc = scheme.get_model_config()
    assert mc.model_width > 0


def test_unknown_config_key_raises():
    with pytest.raises(KeyError):
        import_scheme("zinc.svd")({"not_a_real_key": 1})


def _common(d, scheme_name, model_name, ds_file, **kw):
    cfg = {
        "scheme": scheme_name,
        "model_name": model_name,
        "dataset_path": str(ds_file),
        "cache_dir": str(d / f"cache_{model_name}"),
        "save_path": str(d / "models" / model_name),
        "batch_size": 8,
        "num_epochs": 2,
        "model_width": 16,
        "edge_width": 8,
        "num_heads": 4,
        "model_height": 2,
        "use_svd": False,
        "upto_hop": 2,
        "log_tensorboard": False,
    }
    cfg.update(kw)
    return cfg


def test_pattern_scheme_e2e(tmp_path):
    f = make_pattern_like(str(tmp_path / "p.h5"), n_records=16)
    cfg = _common(tmp_path, "pattern.svd", "pat", f)
    scheme = import_scheme("pattern.svd")(cfg)
    scheme.execute_training()
    assert scheme.state["current_epoch"] == 2
    # custom sklearn eval path
    cfg2 = _common(tmp_path, "pattern.svd", "pat", f, weight_file="")
    scheme2 = import_scheme("pattern.svd")(cfg2)
    scheme2.do_evaluations()
    assert (tmp_path / "models" / "pat" / "predictions"
            / "testset_evals.txt").exists()


def test_tsp_scheme_e2e(tmp_path):
    f = make_tsp_like(str(tmp_path / "t.h5"), n_records=8)
    cfg = _common(tmp_path, "tsp.svd", "tsp", f, batch_size=4)
    scheme = import_scheme("tsp.svd")(cfg)
    scheme.execute_training()
    cfg2 = _common(tmp_path, "tsp.svd", "tsp", f, batch_size=4, weight_file="")
    scheme2 = import_scheme("tsp.svd")(cfg2)
    scheme2.do_evaluations()
    txt = (tmp_path / "models" / "tsp" / "predictions"
           / "testset_evals.txt").read_text()
    assert "f1 = " in txt


def test_mnist_scheme_e2e(tmp_path):
    f = make_mnist_like(str(tmp_path / "m.h5"), n_records=16)
    cfg = _common(tmp_path, "mnist.svd", "mn", f)
    scheme = import_scheme("mnist.svd")(cfg)
    scheme.execute_training()
    assert scheme.state["current_epoch"] == 2


def test_ablation_variants_train(tmp_path):
    """egt_simple (bias), egt_constrained, ungated — one epoch each on tiny data."""
    from tests.synth import make_zinc_like

    f = make_zinc_like(str(tmp_path / "z.h5"), n_records=16)
    for tag, kw in [
        ("simple", {"edge_channel_type": "bias"}),
        ("constrained", {"edge_channel_type": "constrained"}),
        ("ungated", {"gate_attention": False}),
    ]:
        cfg = _common(tmp_path, "zinc.svd", f"z_{tag}", f, num_epochs=1, **kw)
        scheme = import_scheme("zinc.svd")(cfg)
        scheme.execute_training()
        assert scheme.state["current_epoch"] == 1
