"""Large-graph capability demo: graphs that do NOT fit on one chip train
under edge partitioning (the CP analog for graphs — SURVEY §2.9/§5.7).

The reference caps padded graphs at l<=499 (TSP) because its attention
materializes the full dense (b, l, l, h) grid on one device
(`/root/reference/lib/models/egt_layers.py:79-143`). This framework shards
the N x N edge grid over the mesh's model axis (`parallel/edge_partition.py`),
so the per-device footprint of every quadratic tensor drops by the shard
count. Two legs, two kinds of evidence:

Leg A (REAL TPU, one chip): run the actual training step at growing pad
lengths with per-step peak-HBM readings from the device allocator
(`device.memory_stats()`), up to the length where the chip genuinely OOMs —
the RESOURCE_EXHAUSTED text is recorded verbatim. This measures the
single-device memory wall, not a model of it.

Leg B (virtual 8-device CPU mesh): the SAME model shape that OOMed in leg A
executes a real jitted train step (grads + optimizer, donated state) under
sp=4 and sp=8 with the fused attention kernel ON (rectangular row-shard
grids; interpret-mode on CPU), recording the collective bytes XLA inserted
and the per-device share of the quadratic activations. The same script run
on a real 8-chip slice measures real step times (--tpu-mesh).

    python tools/large_graph_demo.py --out MULTICHIP_BENCH_largegraph.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# demo shape: zinc500k-like streams (w=64, ew=64, h=8) at multi-thousand-node
# pad lengths; height=4 keeps the CPU-mesh leg tractable while the quadratic
# activations still dominate (> 97% of live bytes at l >= 1024)
WIDTH, EDGE_WIDTH, HEADS, HEIGHT = 64, 64, 8, 4


def _build(l: int, use_pallas, sp_batch: int = 1, dtype="bfloat16"):
    from egt_tpu.models.graph_model import EGTGraphModel, GraphModelConfig

    cfg = GraphModelConfig(
        model_width=WIDTH, edge_width=EDGE_WIDTH, num_heads=HEADS,
        model_height=HEIGHT, node_input_kind="tokens",
        edge_input_kind="tokens", num_node_features=28, num_edge_features=4,
        num_targets=1, readout_kind="graph", upto_hop=2,
        random_mask_prob=0.0, compute_dtype=dtype,
        # per-layer remat is the honest large-graph config (the measured
        # throughput loss it costs at the shipped small shapes is the price
        # of admission here: without it even one layer's saved per-pair
        # chain exceeds HBM long before the attention itself does)
        remat=True,
        fused_attention=use_pallas)
    return EGTGraphModel(cfg)


def _step_fn(model, tx):
    import jax
    import jax.numpy as jnp
    import optax

    from egt_tpu.training import metrics as M

    def loss_fn(p, bt, key):
        out, _ = model.apply(p, bt, training=True, rng=key)
        s, c = M.mae_loss(out, bt["target"], None, bt["sample_mask"])
        return s / jnp.maximum(c, 1.0)

    def step(p, o, bt, key):
        loss, g = jax.value_and_grad(loss_fn)(p, bt, key)
        up, o2 = tx.update(g, o, p)
        return optax.apply_updates(p, up), o2, loss

    return step


def quadratic_activation_bytes(l: int, lq: int, dtype_bytes: int = 2) -> int:
    """Per-device live bytes of the l_q x l per-pair tensors one layer keeps
    for the backward pass on the einsum path: e_in, gates, e_bias, h_hat,
    softmax out, sigmoid out, edge-FFN hidden (2x ew), edge residual out —
    ~ (4*ew + 4*h + 2*ew) widths' worth. The single-device case is lq == l."""
    per_pair = lq * l * dtype_bytes
    return HEIGHT * per_pair * (6 * EDGE_WIDTH + 4 * HEADS)


def leg_a_single_chip(lengths, stop_after_oom=True):
    """Real-TPU memory wall: peak HBM per step vs pad length, to the OOM."""
    import numpy as np

    import jax
    import optax

    from egt_tpu.parallel.dryrun import synthetic_batch

    dev = jax.devices()[0]
    rows = []
    for l in lengths:
        model = _build(l, use_pallas="auto")
        tx = optax.adam(1e-3)
        rng = np.random.default_rng(0)
        batch = jax.device_put(synthetic_batch(rng, 1, l))
        row = {"l": l, "devices": 1, "sp": 1}
        try:
            params = model.init(jax.random.PRNGKey(0))
            opt = tx.init(params)
            t0 = time.time()
            compiled = jax.jit(_step_fn(model, tx), donate_argnums=(0, 1)) \
                .lower(params, opt, batch, jax.random.PRNGKey(1)).compile()
            compile_s = time.time() - t0
            ma = compiled.memory_analysis()
            if ma is not None and (ma.temp_size_in_bytes
                                   or ma.argument_size_in_bytes):
                row["compiled_device_gb"] = {
                    "temp": round(ma.temp_size_in_bytes / 2**30, 3),
                    "arguments": round(ma.argument_size_in_bytes / 2**30, 3),
                    "output": round(ma.output_size_in_bytes / 2**30, 3),
                }
            params, opt, loss = jax.block_until_ready(
                compiled(params, opt, batch, jax.random.PRNGKey(1)))
            t0 = time.time()
            for _ in range(3):
                params, opt, loss = compiled(params, opt, batch,
                                             jax.random.PRNGKey(2))
            jax.block_until_ready(loss)
            row.update(ok=True, ms_per_step=round((time.time() - t0) / 3 * 1e3, 1),
                       compile_s=round(compile_s, 1))
            stats = dev.memory_stats() or {}
            if "peak_bytes_in_use" in stats:
                row["peak_hbm_gb"] = round(
                    stats["peak_bytes_in_use"] / 2**30, 2)
            log(f"[leg A] l={l}: ok, {row.get('ms_per_step')} ms/step, "
                f"device mem {row.get('compiled_device_gb')}")
        except Exception as e:  # RESOURCE_EXHAUSTED lands here
            msg = str(e)
            row.update(ok=False, error_type=type(e).__name__,
                       error=msg[:2500])
            log(f"[leg A] l={l}: {type(e).__name__}: {msg[:400]}")
            rows.append(row)
            if stop_after_oom:
                break
            continue
        rows.append(row)
    return rows


def leg_b_sp_mesh(l: int, sp_values, use_pallas: bool, iters: int = 2,
                  compile_only: bool = False):
    """Edge-partitioned training step at the leg-A OOM shape. With
    `compile_only`, lower+compile the SPMD program and report the compiler's
    per-device memory analysis instead of executing (the virtual CPU mesh
    shares one host's RAM, so the multi-GiB shapes that motivate sp can be
    COMPILED per-device-shaped even where executing all shards in one
    process would not fit)."""
    import numpy as np

    import jax
    import jax.numpy as jnp
    import optax

    from egt_tpu.parallel import edge_partition as epmod
    from egt_tpu.parallel import mesh as meshlib
    from egt_tpu.parallel.dryrun import synthetic_batch
    from egt_tpu.training import metrics as M
    from tools.bench_multichip import collective_bytes

    rows = []
    for sp in sp_values:
        mesh = meshlib.make_mesh(sp, model_parallel=sp)
        model = _build(l, use_pallas=use_pallas)
        tx = optax.adam(1e-3)
        params = model.init(jax.random.PRNGKey(0))
        opt = tx.init(params)
        params = meshlib.replicate_tree(params, mesh)
        opt = meshlib.replicate_tree(opt, mesh)
        rng = np.random.default_rng(0)
        batch = synthetic_batch(rng, 1, l)

        def loss_fn(p, bt, key):
            del key
            out = epmod.edge_partitioned_forward(
                model, p, bt, mesh, axis=meshlib.MODEL_AXIS)
            s, c = M.mae_loss(out, bt["target"], None, bt["sample_mask"])
            return s / jnp.maximum(c, 1.0)

        def step(p, o, bt, key):
            loss, g = jax.value_and_grad(loss_fn)(p, bt, key)
            up, o2 = tx.update(g, o, p)
            return optax.apply_updates(p, up), o2, loss

        with mesh:
            dbatch = meshlib.put_global_batch(batch, mesh)
            t0 = time.time()
            compiled = jax.jit(step, donate_argnums=(0, 1)).lower(
                params, opt, dbatch, jax.random.PRNGKey(1)).compile()
            compile_s = time.time() - t0
            coll = collective_bytes(compiled)
            row = {
                "l": l, "devices": sp, "sp": sp, "use_pallas": use_pallas,
                "compile_s": round(compile_s, 1),
                "collective_bytes_per_step": coll,
                "quadratic_activation_gb_per_device": round(
                    quadratic_activation_bytes(l, l // sp) / 2**30, 2),
                "quadratic_activation_gb_single_device": round(
                    quadratic_activation_bytes(l, l) / 2**30, 2),
            }
            ma = compiled.memory_analysis()
            if ma is not None and ma.temp_size_in_bytes:
                row["compiled_per_device_gb"] = {
                    "temp": round(ma.temp_size_in_bytes / 2**30, 3),
                    "arguments": round(ma.argument_size_in_bytes / 2**30, 3),
                    "output": round(ma.output_size_in_bytes / 2**30, 3),
                }
            if compile_only:
                row["ok"] = "compiled"
                log(f"[leg B] sp={sp} l={l} pallas={use_pallas}: compiled; "
                    f"per-device {row.get('compiled_per_device_gb')}")
                rows.append(row)
                continue
            params, opt, loss = compiled(params, opt, dbatch,
                                         jax.random.PRNGKey(1))
            jax.block_until_ready(loss)
            t0 = time.time()
            for i in range(iters):
                params, opt, loss = compiled(params, opt, dbatch,
                                             jax.random.PRNGKey(2 + i))
            jax.block_until_ready(loss)
            dt = (time.time() - t0) / iters
        row.update(ok=True, loss=round(float(loss), 5),
                   ms_per_step=round(dt * 1e3, 1))
        log(f"[leg B] sp={sp} l={l} pallas={use_pallas}: "
            f"{row['ms_per_step']} ms/step, per-device quadratic "
            f"{row['quadratic_activation_gb_per_device']} GiB "
            f"(single-device would be "
            f"{row['quadratic_activation_gb_single_device']} GiB)")
        rows.append(row)
    # same (shape, seed, step sequence) at sp=1 vs sp>1: record the loss
    # delta on every executed row so the artifact carries the sharded-vs-
    # unsharded equivalence (proven to 1e-5 in tests/test_sp_training.py)
    # instead of bare per-row losses. Losses are untrained-model values on
    # l-sized random data — comparable only within the same l.
    ref = next((r for r in rows if r["sp"] == 1 and r.get("ok") is True),
               None)
    if ref is not None:
        for r in rows:
            if r.get("ok") is True and r["sp"] != 1:
                r["loss_vs_unsharded"] = round(r["loss"] - ref["loss"], 5)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lengths", default="1024,1536,2048,3072,4096")
    ap.add_argument("--sp", default="4,8")
    ap.add_argument("--out", default="MULTICHIP_BENCH_largegraph.json")
    ap.add_argument("--leg", default="both", choices=["a", "b", "both"])
    ap.add_argument("--oom-l", type=int, default=None,
                    help="leg B pad length (default: leg A's OOM length, or "
                    "the largest --lengths entry if leg A is skipped)")
    ap.add_argument("--no-pallas", action="store_true",
                    help="leg B with the einsum sp path instead of the "
                    "fused kernel")
    ap.add_argument("--compile-only", action="store_true",
                    help="leg B: lower+compile and report the per-device "
                    "memory analysis without executing")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--tpu-mesh", action="store_true",
                    help="leg B on the real device mesh (needs a slice)")
    args = ap.parse_args()

    lengths = [int(x) for x in args.lengths.split(",")]
    out = {"shape": {"width": WIDTH, "edge_width": EDGE_WIDTH,
                     "heads": HEADS, "height": HEIGHT, "batch": 1,
                     "dtype": "bfloat16"}}

    oom_l = args.oom_l
    if args.leg in ("a", "both"):
        rows = leg_a_single_chip(lengths)
        out["single_chip"] = rows
        for r in rows:
            if not r.get("ok"):
                oom_l = oom_l or r["l"]

    if args.leg in ("b", "both"):
        import jax
        if not args.tpu_mesh:
            # leg B must run in a FRESH process on the CPU backend; when leg A
            # already initialized the TPU in this one, re-exec ourselves
            if args.leg == "both":
                payload = dict(vars(args), leg="b",
                               oom_l=oom_l or max(lengths))
                cmd = [sys.executable, os.path.abspath(__file__),
                       "--leg", "b", "--oom-l", str(payload["oom_l"]),
                       "--sp", args.sp, "--iters", str(args.iters),
                       "--out", "-"]
                if args.no_pallas:
                    cmd.append("--no-pallas")
                import subprocess
                log(f"[leg B] re-exec on CPU backend: {' '.join(cmd)}")
                res = subprocess.run(cmd, capture_output=True, text=True)
                sys.stderr.write(res.stderr)
                if res.returncode:
                    raise RuntimeError(f"leg B failed rc={res.returncode}")
                out["edge_partitioned"] = json.loads(res.stdout)
            else:
                nvirt = max(int(x) for x in args.sp.split(","))
                flags = os.environ.get("XLA_FLAGS", "")
                if "host_platform_device_count" not in flags:
                    os.environ["XLA_FLAGS"] = (
                        flags + f" --xla_force_host_platform_device_count"
                        f"={nvirt}").strip()
                jax.config.update("jax_platforms", "cpu")
                rows = leg_b_sp_mesh(oom_l or max(lengths),
                                     [int(x) for x in args.sp.split(",")],
                                     use_pallas=not args.no_pallas,
                                     iters=args.iters,
                                     compile_only=args.compile_only)
                if args.out == "-":
                    print(json.dumps(rows))
                    return
                out["edge_partitioned"] = rows
        else:
            rows = leg_b_sp_mesh(oom_l or max(lengths),
                                 [int(x) for x in args.sp.split(",")],
                                 use_pallas=not args.no_pallas,
                                 iters=args.iters,
                                 compile_only=args.compile_only)
            out["edge_partitioned"] = rows

    with open(args.out, "w") as fp:
        json.dump(out, fp, indent=1)
    log(f"written to {args.out}")


if __name__ == "__main__":
    main()
