"""Serving export: AOT StableHLO artifact round-trip (egt_tpu/serving.py)."""

import numpy as np

from egt_tpu.training.schemes import import_scheme
from tests.synth import make_zinc_like


def test_export_and_serve(tmp_path):
    make_zinc_like(str(tmp_path / "z.h5"), n_records=24)
    cfg = {
        "scheme": "zinc.svd",
        "model_name": "srv",
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
    scheme = import_scheme("zinc.svd")(cfg)
    scheme.execute_training()

    path = import_scheme("zinc.svd")(dict(cfg, weight_file="")).export_serving(
        str(tmp_path / "model.bin"))

    # the artifact reloads WITHOUT the framework's model machinery and
    # reproduces the live predict step bit-for-bit
    from egt_tpu.serving import load_serving

    serve = load_serving(path)
    scheme2 = import_scheme("zinc.svd")(dict(cfg, weight_file=""))
    scheme2.pred_flag = True
    scheme2.prepare_for_test()
    for batch, live_out in scheme2.predict_split("test"):
        feed = {k: v for k, v in batch.items() if k != "target"}
        served = np.asarray(serve(feed))
        np.testing.assert_allclose(served, np.asarray(live_out),
                                   rtol=1e-6, atol=1e-6)
        break
