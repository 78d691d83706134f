"""End-to-end slice: synthetic ZINC -> cache -> train -> checkpoint/resume -> eval.

This is the SURVEY.md §7 "minimum end-to-end slice" exercised on CPU with a tiny model.
"""

import json
import os

import numpy as np
import pytest

from tests.synth import make_zinc_like


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    make_zinc_like(str(d / "zinc.h5"), n_records=48)
    return d


def zinc_config(d, **kw):
    cfg = {
        "scheme": "zinc.svd",
        "model_name": "tiny",
        "dataset_path": str(d / "zinc.h5"),
        "cache_dir": str(d / "cache"),
        "save_path": str(d / "models" / "tiny"),
        "batch_size": 16,
        "num_epochs": 3,
        "model_width": 16,
        "edge_width": 8,
        "model_height": 2,
        "num_heads": 4,
        "use_svd": False,
        "upto_hop": 2,
        "initial_lr": 1e-3,
        "rlr_patience": 50,
        "log_tensorboard": False,
    }
    cfg.update(kw)
    return cfg


def test_train_eval_resume(workdir):
    from egt_tpu.training.schemes import import_scheme

    d = workdir
    cfg = zinc_config(d)
    scheme = import_scheme(cfg["scheme"])(cfg)
    scheme.execute_training()

    # run dir artifacts (mirrors the reference layout)
    base = d / "models" / "tiny"
    assert (base / "config" / "config.json").exists()
    assert (base / "summary.txt").exists() or (base / "summary").exists() or \
        os.path.exists(str(base / "summary") + ".txt")
    assert (base / "saved" / "tiny.npz").exists()
    assert (base / "logs" / "metrics.jsonl").exists()
    assert scheme.state["current_epoch"] == 3

    with open(base / "logs" / "metrics.jsonl") as fp:
        recs = [json.loads(l) for l in fp]
    assert len(recs) == 3
    # toy task is learnable: training MAE should drop
    assert recs[-1]["mae"] < recs[0]["mae"]

    # --- resume: bump epochs, new scheme instance picks up the checkpoint
    cfg2 = zinc_config(d, num_epochs=4)
    scheme2 = import_scheme(cfg2["scheme"])(cfg2)
    scheme2.execute_training()
    assert scheme2.state["current_epoch"] == 4
    # plateau state survived the round-trip
    assert scheme2.state["save_best_value"] < float("inf")

    # --- evaluation over all three splits with the final weights
    cfg3 = zinc_config(d, weight_file="")
    scheme3 = import_scheme(cfg3["scheme"])(cfg3)
    scheme3.do_evaluations()
    preds = base / "predictions"
    assert (preds / "testset_evals.txt").exists()


def test_eval_latest_snapshot(workdir):
    """weight_file ':' resolves the newest epochNNNN snapshot
    (`training_base.py:330-344` semantics)."""
    from egt_tpu.training.checkpoint import latest_epoch_snapshot

    d = workdir
    saved = d / "models" / "tiny" / "saved"
    latest = latest_epoch_snapshot(str(saved))
    assert latest.endswith(".npz") and "epoch" in latest


def test_use_pallas_auto(workdir, tmp_path):
    """'auto' enables the fused attention kernel only where it wins (matrix-derived
    thresholds per edge width, CROSSOVER_MATRIX.json via ops/crossover.py)."""
    from egt_tpu.training.schemes import import_scheme

    cfg = zinc_config(workdir, use_pallas="auto", model_name="auto",
                      save_path=str(tmp_path / "auto"))
    scheme = import_scheme(cfg["scheme"])(cfg)
    scheme.load_data()
    scheme.load_model()
    # 'auto' is now resolved per TRACED shape inside the model (bucket-safe),
    # so the config carries the sentinel through
    assert scheme.model_config.fused_attention == "auto"

    from egt_tpu.models import layers as L

    class _Probe:
        fused_attention = "auto"
        edge_width = 64
        model_width = 64
        num_heads = 8
        compute_dtype = "bfloat16"

    # the layer-level decision: einsum below the measured ew=64 crossover,
    # kernel above (TSP l=512 is a measured win; ZINC l=40 a measured loss)
    assert not L._auto_fused(_Probe(), 40)
    assert L._auto_fused(_Probe(), 512)


def test_multi_step_dispatch_matches_single(workdir, tmp_path):
    """steps_per_dispatch > 1 (lax.scan over K stacked batches) must reproduce
    the K=1 trajectory exactly: same batches, same per-step PRNG folds."""
    from egt_tpu.training.schemes import import_scheme

    d = workdir
    res = {}
    for k in (1, 3):
        cfg = zinc_config(d, num_epochs=2, save_path=str(tmp_path / f"k{k}"),
                          model_name=f"k{k}", steps_per_dispatch=k,
                          batch_size=8)
        scheme = import_scheme(cfg["scheme"])(cfg)
        scheme.execute_training()
        res[k] = scheme.evaluate_split("validation")["mae"]
    np.testing.assert_allclose(res[3], res[1], rtol=1e-6, atol=1e-7)


def test_svd_pe_path(workdir, tmp_path):
    """Same slice with SVD positional encodings enabled."""
    from egt_tpu.training.schemes import import_scheme

    d = workdir
    cfg = zinc_config(d, use_svd=True, num_svd_features=8, sel_svd_features=4,
                      num_epochs=1, save_path=str(tmp_path / "m2"),
                      model_name="tiny_svd")
    scheme = import_scheme(cfg["scheme"])(cfg)
    scheme.execute_training()
    assert scheme.state["current_epoch"] == 1
