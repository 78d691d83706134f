"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np

from egt_tpu.parallel.dryrun import run_one_step


def test_devices_available():
    assert len(jax.devices()) == 8


def test_dp_only():
    loss = run_one_step(4, model_parallel=1)
    assert np.isfinite(loss)


def test_dp_tp_mesh():
    loss = run_one_step(8, model_parallel=2)
    assert np.isfinite(loss)


def test_dp_matches_single_device():
    """The sharded step must compute the same loss as a single device."""
    l1 = run_one_step(1, model_parallel=1, batch_size=8)
    l4 = run_one_step(4, model_parallel=1, batch_size=8)
    np.testing.assert_allclose(l1, l4, rtol=1e-5)


def test_tp_matches_dp():
    l_dp = run_one_step(4, model_parallel=1, batch_size=8)
    l_tp = run_one_step(4, model_parallel=4, batch_size=8)
    np.testing.assert_allclose(l_dp, l_tp, rtol=1e-4)


def test_graft_entry():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
