"""Schedule unit tests: warmup+cosine and the plateau state machine
(reference: `lib/base/genutil/warmup.py:41-75`, `lib/training/training_base.py:133-181`)."""

import math

from egt_tpu.training.schedules import PlateauConfig, default_plateau_state, \
    plateau_update, warmup_cosine_lr


def test_warmup_ramp():
    # lr at step s (< warmup) = max_lr * (s+1)/warmup  (min_lr=0)
    for s in range(10):
        lr, stop = warmup_cosine_lr(s, warmup_steps=10, max_lr=1.0)
        assert not stop
        assert abs(lr - (s + 1) / 10) < 1e-12
    # past warmup with no total_steps: no change, no stop
    lr, stop = warmup_cosine_lr(10, warmup_steps=10, max_lr=1.0)
    assert lr is None and not stop


def test_cosine_decay_and_stop():
    w, t = 10, 110
    lr0, _ = warmup_cosine_lr(w, warmup_steps=w, max_lr=1.0, total_steps=t)
    assert abs(lr0 - 1.0) < 1e-12  # cos(0)
    lr_end, _ = warmup_cosine_lr(t, warmup_steps=w, max_lr=1.0, total_steps=t)
    assert abs(lr_end - math.cos(0.5 * math.pi)) < 1e-12  # -> 0
    lr, stop = warmup_cosine_lr(t + 1, warmup_steps=w, max_lr=1.0,
                                total_steps=t)
    assert stop and lr is None


def test_plateau_reduce_and_stop():
    cfg = PlateauConfig(monitor="val_mae", rlr_factor=0.5, rlr_patience=3,
                        min_lr=0.01, stopping_lr=0.03)
    st = default_plateau_state()
    lr = 0.1
    logs = []

    def log(x):
        logs.append(x)

    # epoch 1: improvement
    lr, improved, stop = plateau_update(st, cfg, lr, 1, {"val_mae": 1.0}, log)
    assert improved and not stop and lr == 0.1
    assert st["save_best_value"] == 1.0 and st["save_best_epoch"] == 1

    # epochs 2..3: no improvement, gap < patience
    for e in (2, 3):
        lr, improved, stop = plateau_update(st, cfg, lr, e, {"val_mae": 2.0},
                                            log)
        assert not improved and lr == 0.1
    # epoch 4: gap = 3 -> reduce
    lr, improved, stop = plateau_update(st, cfg, lr, 4, {"val_mae": 2.0}, log)
    assert lr == 0.05 and st["last_reduce_lr"] == 4 and not stop
    # epochs 5..6 no reduce (gap measured from last reduce)
    for e in (5, 6):
        lr, _, stop = plateau_update(st, cfg, lr, e, {"val_mae": 2.0}, log)
        assert lr == 0.05
    # epoch 7 -> reduce to 0.025 < stopping_lr 0.03 -> stop
    lr, _, stop = plateau_update(st, cfg, lr, 7, {"val_mae": 2.0}, log)
    assert lr == 0.025 and stop


def test_plateau_min_lr_floor():
    cfg = PlateauConfig(monitor="m", rlr_factor=0.5, rlr_patience=1,
                        min_lr=0.04, stopping_lr=0.0)
    st = default_plateau_state()
    st["save_best_value"] = 0.0  # never improves
    lr = 0.1
    for e in range(1, 6):
        lr, _, _ = plateau_update(st, cfg, lr, e, {"m": 1.0}, lambda x: None)
    assert lr == 0.04  # floored


def test_save_when_dsl(tmp_path):
    import jax.numpy as jnp

    from egt_tpu.training.checkpoint import SaveWhen

    sw = SaveWhen(str(tmp_path), "epoch;val_mae<=save_best_value;epoch{epoch:0>4d}")
    params = {"w": jnp.ones((2,))}
    saved = sw.maybe_save("epoch", {"val_mae": 0.5, "save_best_value": 1.0,
                                    "epoch": 7}, params)
    assert saved and saved[0].endswith("epoch0007.npz")
    # no save when not improved
    saved = sw.maybe_save("epoch", {"val_mae": 2.0, "save_best_value": 1.0,
                                    "epoch": 8}, params)
    assert not saved
    # missing log key -> ignored, no crash (reference NameError path)
    saved = sw.maybe_save("epoch", {"epoch": 9}, params)
    assert not saved


def test_roofline_model_sanity():
    """Analytic FLOP/traffic model: positive, quadratic in l, linear in depth."""
    from egt_tpu.utils.roofline import ShapeModel, \
        v100_tf2_baseline_graphs_per_sec

    m = ShapeModel(b=128, l=40, w=64, ew=64, h=8, height=10)
    m2 = ShapeModel(b=128, l=80, w=64, ew=64, h=8, height=10)
    md = ShapeModel(b=128, l=40, w=64, ew=64, h=8, height=20)
    f, f2, fd = (x.train_flops_per_graph() for x in (m, m2, md))
    assert f > 0 and 3.3 < f2 / f < 4.1        # ~quadratic in l
    assert abs(fd / f - 2.0) < 1e-6            # linear in depth
    assert 0 < m.mfu(8500.0) < 0.5
    assert 0 < m.hbm_bw_util_lower_bound(8500.0) < 1.0
    # the derived baseline is in a sane band for a V100-class GPU
    assert 500 < v100_tf2_baseline_graphs_per_sec(m) < 10000
