"""Trainer-level edge partitioning: train a scheme with edge_partition > 1 on the
virtual CPU mesh and check it matches single-device training numerically."""

import numpy as np

from egt_tpu.training.schemes import import_scheme
from tests.synth import make_zinc_like


def _cfg(d, name, **kw):
    cfg = {
        "scheme": "zinc.svd",
        "model_name": name,
        "dataset_path": str(d / "z.h5"),
        "cache_dir": str(d / "cache"),
        "save_path": str(d / "models" / name),
        "batch_size": 8,
        "num_epochs": 2,
        "model_width": 16,
        "edge_width": 8,
        "model_height": 2,
        "num_heads": 4,
        "use_svd": False,
        "upto_hop": 2,
        "log_tensorboard": False,
        # this test pins SHARDING equivalence to tight tolerances; the bf16
        # engine default would add dtype noise orthogonal to what it checks
        "compute_dtype": "float32",
    }
    cfg.update(kw)
    return cfg


def test_sp_training_matches_single_device(tmp_path):
    make_zinc_like(str(tmp_path / "z.h5"), n_records=16, n_min=6, n_max=14)

    # ZINC pads to 40, divisible by 4 shards
    s1 = import_scheme("zinc.svd")(_cfg(tmp_path, "ref"))
    s1.execute_training()

    s2 = import_scheme("zinc.svd")(_cfg(tmp_path, "sp", edge_partition=4))
    s2.execute_training()

    r1 = s1.evaluate_split("validation")
    r2 = s2.evaluate_split("validation")
    # identical data order + identical rng stream structure is not guaranteed
    # (random-mask streams differ per shard), but here random_mask_prob=0 so the
    # trajectories must match to numerical tolerance
    np.testing.assert_allclose(r1["mae"], r2["mae"], rtol=1e-4, atol=1e-5)


def test_sp_training_with_dp(tmp_path):
    """2 data shards x 2 edge shards on 4 virtual devices."""
    make_zinc_like(str(tmp_path / "z.h5"), n_records=16, n_min=6, n_max=14)
    cfg = _cfg(tmp_path, "dpsp", edge_partition=2, distributed=True,
               num_devices=4, batch_size=8, num_epochs=1)
    s = import_scheme("zinc.svd")(cfg)
    s.execute_training()
    assert s.state["current_epoch"] == 1


def test_sp_training_fused_attention_matches_einsum(tmp_path):
    """VERDICT r2 #6: the fused attention kernel composed WITH edge partitioning
    (rectangular row-shard grids) must match the einsum sp path."""
    make_zinc_like(str(tmp_path / "z.h5"), n_records=16, n_min=6, n_max=14)

    s1 = import_scheme("zinc.svd")(_cfg(tmp_path, "sp_einsum", edge_partition=4,
                                        use_pallas=False))
    s1.execute_training()

    s2 = import_scheme("zinc.svd")(_cfg(tmp_path, "sp_fused", edge_partition=4,
                                        use_pallas=True))
    s2.execute_training()

    r1 = s1.evaluate_split("validation")
    r2 = s2.evaluate_split("validation")
    np.testing.assert_allclose(r1["mae"], r2["mae"], rtol=1e-4, atol=1e-5)
