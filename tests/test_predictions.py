"""make_predictions parity (reference TrainingBase.make_predictions)."""

import numpy as np

from egt_tpu.training.schemes import import_scheme
from tests.synth import make_zinc_like


def test_make_predictions(tmp_path):
    make_zinc_like(str(tmp_path / "z.h5"), n_records=12)
    cfg = {
        "scheme": "zinc.svd",
        "model_name": "p",
        "dataset_path": str(tmp_path / "z.h5"),
        "cache_dir": str(tmp_path / "cache"),
        "save_path": str(tmp_path / "m"),
        "batch_size": 8,
        "num_epochs": 1,
        "model_width": 16,
        "edge_width": 8,
        "model_height": 2,
        "num_heads": 4,
        "use_svd": False,
        "upto_hop": 2,
        "log_tensorboard": False,
    }
    s = import_scheme("zinc.svd")(cfg)
    s.execute_training()

    s2 = import_scheme("zinc.svd")(dict(cfg, weight_file=""))
    s2.make_predictions()
    preds = np.load(tmp_path / "m" / "predictions" / "testset_predictions.npz")
    assert preds["predictions"].shape == (12, 1)
    assert np.all(np.isfinite(preds["predictions"]))
