"""Multi-host (multi-process) data parallelism: 2 processes x 2 CPU devices.

Spawns two real OS processes that form a JAX distributed cluster (Gloo CPU
collectives), feed per-process local batch shards through
`mesh.put_global_batch`, and run one jitted train step over the global 4-device
mesh. Both processes must agree on the loss, and it must equal the
single-process result on the same batch — validating the cross-host gradient
all-reduce and the local-shard slicing (`parallel/mesh.py:put_global_batch`).
"""

import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

WORKER = textwrap.dedent("""
    import os, sys
    pid, port = int(sys.argv[1]), sys.argv[2]
    os.environ["XLA_FLAGS"] = " --xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    sys.path.insert(0, %(repo)r)
    import numpy as np
    import jax.numpy as jnp
    import optax
    from egt_tpu.parallel import mesh as meshlib
    from egt_tpu.parallel.dryrun import tiny_model_config, synthetic_batch
    from egt_tpu.models.graph_model import EGTGraphModel
    from egt_tpu.training import metrics as M, optim

    assert jax.process_count() == 2 and jax.device_count() == 4
    mesh = meshlib.make_mesh()          # 4 global devices, data axis
    cfg = tiny_model_config(random_mask_prob=0.0)
    model = EGTGraphModel(cfg)
    params = meshlib.replicate_tree(model.init(jax.random.PRNGKey(0)), mesh)
    optimizer = optim.make_optimizer("adam", 1e-3, params=params)
    opt_state = meshlib.replicate_tree(optimizer.init(params), mesh)

    # every process builds the SAME global batch (same seed), as the engine does
    batch = synthetic_batch(np.random.default_rng(0), 8, 16)
    dbatch = meshlib.put_global_batch(batch, mesh)

    rep = meshlib.replicated(mesh)
    bsh = meshlib.batch_sharding(mesh)

    def loss_fn(p, b):
        out, ctx = model.apply(p, b, training=True, rng=jax.random.PRNGKey(1))
        s, c = M.mae_loss(out, b["target"], None, b["sample_mask"])
        return s / jnp.maximum(c, 1.0)

    @jax.jit
    def train_step(p, o, b):
        loss, grads = jax.value_and_grad(loss_fn)(p, b)
        updates, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    params, opt_state, loss = train_step(params, opt_state, dbatch)
    psum = float(jnp.asarray(
        sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(
            jax.device_get(params)))))
    print(f"RESULT {pid} loss={float(loss):.8f} psum={psum:.6f}", flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_data_parallel(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": "/root/repo"})
    port = _free_port()
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        assert p.returncode == 0, out[-3000:]
        outs.append(out)

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, loss_kv, psum_kv = line.split()
                results[int(pid)] = (float(loss_kv.split("=")[1]),
                                     float(psum_kv.split("=")[1]))
    assert set(results) == {0, 1}, outs
    # both processes agree bit-for-bit on the replicated state
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=0, atol=0)
    np.testing.assert_allclose(results[0][1], results[1][1], rtol=0, atol=0)

    # and the loss equals a single-process step on the same global batch
    import jax
    import jax.numpy as jnp
    import optax

    from egt_tpu.models.graph_model import EGTGraphModel
    from egt_tpu.parallel.dryrun import synthetic_batch, tiny_model_config
    from egt_tpu.training import metrics as M, optim

    cfg = tiny_model_config(random_mask_prob=0.0)
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = synthetic_batch(np.random.default_rng(0), 8, 16)

    def loss_fn(p, b):
        out, _ = model.apply(p, b, training=True, rng=jax.random.PRNGKey(1))
        s, c = M.mae_loss(out, b["target"], None, b["sample_mask"])
        return s / jnp.maximum(c, 1.0)

    ref_loss = float(loss_fn(params, batch))
    np.testing.assert_allclose(results[0][0], ref_loss, rtol=1e-5, atol=1e-6)


WORKER4 = textwrap.dedent("""
    import os, sys
    pid, port = int(sys.argv[1]), sys.argv[2]
    os.environ["XLA_FLAGS"] = " --xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=4, process_id=pid)
    sys.path.insert(0, %(repo)r)
    import numpy as np
    import jax.numpy as jnp
    import optax
    from egt_tpu.parallel import mesh as meshlib
    from egt_tpu.parallel.dryrun import tiny_model_config, synthetic_batch
    from egt_tpu.models.graph_model import EGTGraphModel
    from egt_tpu.training import metrics as M, optim

    assert jax.process_count() == 4 and jax.device_count() == 8
    mesh = meshlib.make_mesh()
    cfg = tiny_model_config(random_mask_prob=0.0)
    model = EGTGraphModel(cfg)
    params = meshlib.replicate_tree(model.init(jax.random.PRNGKey(0)), mesh)

    def loss_fn(p, b):
        out, ctx = model.apply(p, b, training=True, rng=jax.random.PRNGKey(1))
        s, c = M.mae_loss(out, b["target"], None, b["sample_mask"])
        return s / jnp.maximum(c, 1.0)

    jloss = jax.jit(loss_fn)

    # an epoch crossing a BUCKET BOUNDARY (pad 16 -> pad 24 recompiles) and
    # ending in a RAGGED batch: only 3 of 16 rows real, so the trailing
    # processes' shards are pure padding — exercises the index-map slicing
    # at uneven record counts (VERDICT r1 item 9)
    batches = []
    b1 = synthetic_batch(np.random.default_rng(0), 16, 16)
    b2 = synthetic_batch(np.random.default_rng(1), 16, 24)
    b3 = synthetic_batch(np.random.default_rng(2), 16, 16)
    for k in b3:
        if b3[k].shape and b3[k].shape[0] == 16:
            pad = np.zeros_like(b3[k][3:])
            if k == "node_features":
                pad = pad - 1
            b3[k] = np.concatenate([b3[k][:3], pad])
    b3["sample_mask"][3:] = 0.0
    losses = []
    for b in (b1, b2, b3):
        db = meshlib.put_global_batch(b, mesh)
        losses.append(float(jloss(params, db)))
    print("RESULT", pid, " ".join(f"{x:.8f}" for x in losses), flush=True)
""")


@pytest.mark.slow
def test_four_process_uneven_buckets(tmp_path):
    """4 processes x 2 devices: bucket-boundary recompile mid-epoch plus a
    ragged final batch whose real records don't reach every process."""
    script = tmp_path / "worker4.py"
    script.write_text(WORKER4 % {"repo": "/root/repo"})
    port = _free_port()
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
        for i in range(4)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        assert p.returncode == 0, out[-3000:]
        outs.append(out)

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                parts = line.split()
                results[int(parts[1])] = [float(x) for x in parts[2:]]
    assert set(results) == {0, 1, 2, 3}, outs
    for pid in (1, 2, 3):
        np.testing.assert_allclose(results[pid], results[0], rtol=0, atol=0)

    # single-process reference on the same three global batches
    import jax
    import jax.numpy as jnp

    from egt_tpu.models.graph_model import EGTGraphModel
    from egt_tpu.parallel.dryrun import synthetic_batch, tiny_model_config
    from egt_tpu.training import metrics as M

    cfg = tiny_model_config(random_mask_prob=0.0)
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))

    def ref_loss(b):
        out, _ = model.apply(params, b, training=True,
                             rng=jax.random.PRNGKey(1))
        s, c = M.mae_loss(out, b["target"], None, b["sample_mask"])
        return float(s / jnp.maximum(c, 1.0))

    b1 = synthetic_batch(np.random.default_rng(0), 16, 16)
    b2 = synthetic_batch(np.random.default_rng(1), 16, 24)
    b3 = synthetic_batch(np.random.default_rng(2), 16, 16)
    for k in b3:
        if b3[k].shape and b3[k].shape[0] == 16:
            pad = np.zeros_like(b3[k][3:])
            if k == "node_features":
                pad = pad - 1
            b3[k] = np.concatenate([b3[k][:3], pad])
    b3["sample_mask"][3:] = 0.0
    expect = [ref_loss(b) for b in (b1, b2, b3)]
    np.testing.assert_allclose(results[0], expect, rtol=1e-5, atol=1e-6)
