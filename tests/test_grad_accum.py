"""Gradient accumulation: accum=A at batch b must equal one optimizer step at
batch A*b (VERDICT r4 item 4).

Exactness argument: the loss is the masked mean over the batch's graphs; for a
graph-level target every graph contributes one mask element, so the mean of A
microbatch losses equals the big-batch loss exactly, and the averaged gradients
match. Dataset batching slices one per-(seed, epoch) record permutation, so A
consecutive microbatches of size b concatenate to exactly the size-A*b batch.
(BatchNorm batch statistics would break this — the recipes under test use
LayerNorm; running-stat merging is sequential per microbatch, documented in
`trainer._grads_over_microbatches`.)

Tolerances: the GRADIENT check is tight (float32 reduction-order round-off
only). Trained-PARAMETER checks are absolute, not relative: Adam's update is
±lr·ĝ/(√v̂+ε), so a round-off-level sign flip on a near-zero gradient moves
that parameter by O(lr) in one step — measured drift after 4 steps at lr=1e-3
is ~3.5e-5 absolute, asserted at 5e-4 (>=10x margin, yet 10x below the scale
a semantic bug — e.g. a wrongly weighted microbatch — would produce).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.synth import make_zinc_like


def _cfg(d, **kw):
    cfg = {
        "scheme": "zinc.svd",
        "model_name": kw.pop("model_name"),
        "dataset_path": str(d / "zinc.h5"),
        "cache_dir": str(d / "cache"),
        "batch_size": 32,
        "num_epochs": 2,
        "model_width": 16,
        "edge_width": 8,
        "model_height": 2,
        "num_heads": 4,
        "use_svd": False,
        "upto_hop": 2,
        "initial_lr": 1e-3,
        "rlr_patience": 50,
        "log_tensorboard": False,
        "compute_dtype": "float32",
        "attention_impl": "einsum",
        "use_pallas": False,
    }
    cfg["save_path"] = str(d / "models" / cfg["model_name"])
    cfg.update(kw)
    return cfg


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("grad_accum")
    # 64 records = 2 full batches of 32 per epoch (no padded tail batch)
    make_zinc_like(str(d / "zinc.h5"), n_records=64)
    return d


def _train_params(d, **kw):
    from egt_tpu.training.schemes import import_scheme

    scheme = import_scheme("zinc.svd")(_cfg(d, **kw))
    scheme.execute_training()
    return jax.device_get(scheme.params), scheme


def _max_abs_err(a, b):
    return max(
        float(np.max(np.abs(np.asarray(la, np.float64)
                            - np.asarray(lb, np.float64))))
        for la, lb in zip(jax.tree_util.tree_leaves(a),
                          jax.tree_util.tree_leaves(b)))


def test_microbatch_grads_equal_big_batch_grads(workdir):
    """White-box: mean of per-microbatch grads == big-batch grads, tightly.
    This is the semantic core; the trained-params tests below only confirm
    the optimizer plumbing around it."""
    from egt_tpu.training.schemes import import_scheme

    scheme = import_scheme("zinc.svd")(
        _cfg(workdir, model_name="wb", batch_size=32))
    scheme.load_data()
    scheme.load_model()
    batch = next(scheme._batches("training", shuffle=False))
    rng = jax.random.PRNGKey(7)

    (_, (_, _)), g_big = jax.value_and_grad(
        scheme._compute_loss, has_aux=True)(scheme.params, batch, rng, True)

    stacked = {k: np.reshape(v, (4, 8) + v.shape[1:]) for k, v in batch.items()}
    micro0 = jax.tree_util.tree_map(lambda x: x[0], stacked)
    acc = scheme._zero_metric_acc(micro0, training=True)
    _, g_acc, acc_out = scheme._grads_over_microbatches(
        scheme.params, acc, stacked, rng)

    scale = max(float(jnp.max(jnp.abs(l))) for l in
                jax.tree_util.tree_leaves(g_big))
    err = _max_abs_err(g_big, g_acc)
    assert err < 1e-5 * max(scale, 1.0), (err, scale)
    # metric accumulator saw all 4 microbatches
    assert float(acc_out["loss"][1]) == 4.0


def test_accum4_equals_big_batch(workdir):
    p_big, s_big = _train_params(workdir, model_name="big",
                                 batch_size=32, grad_accum_steps=1)
    p_acc, s_acc = _train_params(workdir, model_name="acc",
                                 batch_size=8, grad_accum_steps=4)
    # 2 epochs x 2 optimizer steps at lr=1e-3; Adam-noise bound (docstring)
    assert _max_abs_err(p_big, p_acc) < 5e-4
    # step bookkeeping counts OPTIMIZER steps in both runs
    assert s_big.state["global_step"] == s_acc.state["global_step"] == 4
    # and the logged epoch loss is the mean over all microbatches, same both
    # ways (epoch 1: identical initial params, so only round-off separates)
    import json
    losses = []
    for name in ("big", "acc"):
        with open(str(workdir / "models" / name / "logs"
                      / "metrics.jsonl")) as fp:
            losses.append(json.loads(fp.readline())["loss"])
    assert abs(losses[0] - losses[1]) < 1e-4, losses


def test_accum_composes_with_steps_per_dispatch(workdir):
    p_ref, _ = _train_params(workdir, model_name="acc_k1",
                             batch_size=8, grad_accum_steps=4)
    p_k2, s = _train_params(workdir, model_name="acc_k2",
                            batch_size=8, grad_accum_steps=4,
                            steps_per_dispatch=2)
    assert _max_abs_err(p_ref, p_k2) < 5e-4
    assert s.state["global_step"] == 4


def test_accum_tail_stack(tmp_path):
    """72 records at b=8, A=4: each epoch is 2 full stacks + a 1-microbatch
    tail -> the tail-sized program compiles and the epoch completes."""
    d = tmp_path
    make_zinc_like(str(d / "zinc.h5"), n_records=72)
    _, s = _train_params(d, model_name="tail", batch_size=8,
                         grad_accum_steps=4, num_epochs=1)
    # 9 microbatches -> 3 optimizer steps (2 full + 1 tail)
    assert s.state["global_step"] == 3
    with open(str(d / "models" / "tail" / "logs" / "metrics.jsonl")) as fp:
        assert len(fp.readlines()) == 1


def test_accum_on_dp_mesh(workdir):
    """grad accumulation composes with the data-parallel mesh (8 virtual
    devices): runs and matches the single-device accum run."""
    p_ref, _ = _train_params(workdir, model_name="acc_ref2",
                             batch_size=8, grad_accum_steps=2, num_epochs=1)
    p_dp, _ = _train_params(workdir, model_name="acc_dp",
                            batch_size=8, grad_accum_steps=2, num_epochs=1,
                            distributed=True)
    assert _max_abs_err(p_ref, p_dp) < 5e-4
