"""Unit tests for the multichip bench's HLO collective-byte accounting
(VERDICT r2 weak #2: tuple-shaped all-reduces were undercounted)."""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "bench_multichip", os.path.join(REPO, "tools", "bench_multichip.py"))
bm = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bm)


def test_tuple_all_reduce_sums_every_operand():
    txt = """
  %all-reduce.7 = (f32[64,64]{1,0}, f32[64]{0}, bf16[8,8]{1,0}) all-reduce(%a, %b, %c), replica_groups={{0,1}}, to_apply=%add
"""
    out = bm.hlo_collective_bytes(txt)
    assert out["all-reduce"] == 64 * 64 * 4 + 64 * 4 + 8 * 8 * 2


def test_scalar_and_single_shapes():
    txt = """
  %all-reduce.1 = f32[] all-reduce(%loss), replica_groups={}, to_apply=%add
  %all-gather.2 = f32[16,32]{1,0} all-gather(%x), dimensions={0}
"""
    out = bm.hlo_collective_bytes(txt)
    assert out["all-reduce"] == 4
    assert out["all-gather"] == 16 * 32 * 4


def test_async_pairs_counted_once_via_done():
    # -start result repeats the operand (input, output) and must NOT be
    # counted; the -done line carries the plain output shape
    txt = """
  %all-reduce-start.3 = (f32[128]{0}, f32[128]{0}) all-reduce-start(%g), replica_groups={{0,1}}
  %all-reduce-done.3 = f32[128]{0} all-reduce-done(%all-reduce-start.3)
  %collective-permute-start.1 = (bf16[4,4]{1,0}, bf16[4,4]{1,0}, u32[], u32[]) collective-permute-start(%p)
  %collective-permute-done.1 = bf16[4,4]{1,0} collective-permute-done(%collective-permute-start.1)
"""
    out = bm.hlo_collective_bytes(txt)
    assert out["all-reduce"] == 128 * 4
    assert out["collective-permute"] == 4 * 4 * 2


def test_non_collective_lines_ignored():
    txt = """
  %fusion.1 = f32[99]{0} fusion(%x), kind=kLoop, calls=%fused_computation
  %dot.2 = f32[64,64]{1,0} dot(%a, %b), lhs_contracting_dims={1}, rhs_contracting_dims={0}
"""
    out = bm.hlo_collective_bytes(txt)
    assert all(v == 0 for v in out.values())


def test_dp_grad_all_reduce_is_mb_scale_in_real_hlo():
    """End-to-end: compile a tiny dp=2 train step on a virtual CPU mesh and
    check the parsed all-reduce bytes cover one full gradient tuple."""
    import egt_tpu  # noqa: F401  (conftest sets the virtual device flags)
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    if jax.device_count() < 2:
        import pytest
        pytest.skip("needs >= 2 (virtual) devices")

    from egt_tpu.models.graph_model import EGTGraphModel, GraphModelConfig
    from egt_tpu.parallel import mesh as meshlib
    from egt_tpu.parallel.dryrun import synthetic_batch
    from egt_tpu.training import metrics as M

    mesh = meshlib.make_mesh(2)
    cfg = GraphModelConfig(
        model_width=16, edge_width=8, num_heads=4, model_height=1,
        node_input_kind="tokens", edge_input_kind="tokens",
        num_node_features=8, num_edge_features=3, num_targets=1,
        readout_kind="graph", upto_hop=2, random_mask_prob=0.0)
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    params = meshlib.replicate_tree(params, mesh)
    opt = meshlib.replicate_tree(opt, mesh)
    batch = synthetic_batch(np.random.default_rng(0), 4, 8)

    def loss_fn(p, bt):
        out, _ = model.apply(p, bt, training=True, rng=jax.random.PRNGKey(2))
        s, c = M.mae_loss(out, bt["target"], None, bt["sample_mask"])
        return s / jnp.maximum(c, 1.0)

    def step(p, o, bt):
        loss, g = jax.value_and_grad(loss_fn)(p, bt)
        up, o2 = tx.update(g, o, p)
        return optax.apply_updates(p, up), o2, loss

    with mesh:
        dbatch = meshlib.put_global_batch(batch, mesh)
        compiled = jax.jit(step).lower(params, opt, dbatch).compile()
    out = bm.hlo_collective_bytes(compiled.as_text())
    pbytes = 4 * sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    # XLA elides the collective for params whose grads are provably
    # replicated/zero, so require the bulk (not all) of one grad tuple —
    # the broken accounting reported 68 bytes here (~0.5% of params)
    assert out["all-reduce"] >= 0.5 * pbytes, (out, pbytes)
