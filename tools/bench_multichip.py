"""Multi-chip scaling harness: graphs/s and edges/s vs device count.

Runs the REAL jitted train step (params+opt donated, engine semantics) over
dp and dp x sp meshes and reports per-device-count throughput, scaling
efficiency, and the per-step collective traffic XLA inserted (parsed from the
compiled HLO — psums over the `data` axis for grads, ppermute/all-gathers for
edge partitioning).

Correctness-mode (default here, no TPU slice in this environment): virtual
CPU mesh via --xla_force_host_platform_device_count. The SAME script run on a
real slice measures the real numbers — the north star is >= 85% edges/s
scaling at 2 hosts (SURVEY §2.9).

    python tools/bench_multichip.py --devices 1,2,4,8 --mode dp
    python tools/bench_multichip.py --devices 2,4,8 --mode dpsp --sp 2
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


SHAPE_RE = None
DT_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
            "f64": 8, "s64": 8, "u64": 8, "s8": 1, "u8": 1, "pred": 1,
            "s16": 2, "u16": 2}


def hlo_collective_bytes(txt: str) -> dict:
    """Sum collective-op traffic in HLO text.

    XLA's gradient all-reduce is typically ONE op over a tuple of every grad
    tensor — '%all-reduce = (f32[64,64]{1,0}, f32[64]{0}) all-reduce(...)' —
    so every dtype[dims] in the result shape must be summed, not just the
    first match. Async pairs are counted once via the '-done' line (its result
    is the plain output shape; the '-start' result repeats operands and would
    double-count)."""
    import re
    global SHAPE_RE
    if SHAPE_RE is None:
        SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
    out = {"all-reduce": 0, "all-gather": 0, "reduce-scatter": 0,
           "collective-permute": 0, "all-to-all": 0}
    for line in txt.splitlines():
        stripped = line.strip()
        for op in out:
            sync, done = f" {op}(", f" {op}-done("
            if sync in stripped:
                head = stripped.split(sync, 1)[0]
            elif done in stripped:
                head = stripped.split(done, 1)[0]
            else:
                continue
            # result shape(s) sit between '=' and the op name
            head = head.split("=", 1)[-1]
            total = 0
            for dt, dims in SHAPE_RE.findall(head):
                if dt not in DT_BYTES:
                    continue  # e.g. 'token' or layout noise
                n = 1
                for d in dims.split(","):
                    if d:
                        n *= int(d)
                total += n * DT_BYTES[dt]
            out[op] += total
    return out


def collective_bytes(compiled) -> dict:
    return hlo_collective_bytes(compiled.as_text())


def bench(n_devices: int, mode: str, sp: int, batch_per_dev: int, l: int,
          iters: int, width: int, edge_width: int, height: int,
          use_pallas: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from egt_tpu.models.graph_model import EGTGraphModel, GraphModelConfig
    from egt_tpu.parallel import mesh as meshlib
    from egt_tpu.parallel.dryrun import synthetic_batch
    from egt_tpu.training import metrics as M

    model_parallel = sp if mode == "dpsp" else 1
    mesh = meshlib.make_mesh(n_devices, model_parallel=model_parallel)
    dp = n_devices // model_parallel
    b = batch_per_dev * dp

    cfg = GraphModelConfig(
        model_width=width, edge_width=edge_width, num_heads=8,
        model_height=height, node_input_kind="tokens",
        edge_input_kind="tokens", num_node_features=28, num_edge_features=4,
        num_targets=1, readout_kind="graph", upto_hop=4,
        random_mask_prob=0.0, fused_attention=use_pallas)
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    params = meshlib.replicate_tree(params, mesh)
    opt = meshlib.replicate_tree(opt, mesh)

    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, b, l)

    if mode == "dpsp" and model_parallel > 1:
        from egt_tpu.parallel import edge_partition as epmod

        def loss_fn(p, bt, key):
            del key  # sp fwd path is deterministic here (random_mask 0)
            out = epmod.edge_partitioned_forward(
                model, p, bt, mesh, axis=meshlib.MODEL_AXIS,
                data_axis=meshlib.DATA_AXIS)
            s, c = M.mae_loss(out, bt["target"], None, bt["sample_mask"])
            return s / jnp.maximum(c, 1.0)
    else:
        def loss_fn(p, bt, key):
            out, _ = model.apply(p, bt, training=True, rng=key)
            s, c = M.mae_loss(out, bt["target"], None, bt["sample_mask"])
            return s / jnp.maximum(c, 1.0)

    def step(p, o, bt, key):
        loss, g = jax.value_and_grad(loss_fn)(p, bt, key)
        up, o2 = tx.update(g, o, p)
        return optax.apply_updates(p, up), o2, loss

    with mesh:
        dbatch = meshlib.put_global_batch(batch, mesh)
        jstep = jax.jit(step, donate_argnums=(0, 1))
        lowered = jstep.lower(params, opt, dbatch, jax.random.PRNGKey(1))
        compiled = lowered.compile()
        coll = collective_bytes(compiled)
        if mode == "dp" and n_devices > 1:
            # sanity: the gradient all-reduce must cover the bulk of one grad
            # tuple (f32 = 4 bytes/param). XLA elides collectives for params
            # whose grads are provably replicated/zero, so allow headroom —
            # but accounting at the 68-bytes-per-step level (VERDICT r2 weak
            # #2) fails loudly here.
            pbytes = 4 * sum(int(np.prod(x.shape))
                             for x in jax.tree.leaves(params))
            assert coll["all-reduce"] >= 0.5 * pbytes, \
                f"all-reduce accounting {coll['all-reduce']} < half of " \
                f"params bytes {pbytes}"
        params, opt, loss = compiled(params, opt, dbatch,
                                     jax.random.PRNGKey(1))
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for i in range(iters):
            params, opt, loss = compiled(params, opt, dbatch,
                                         jax.random.PRNGKey(2 + i))
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / iters

    gps = b / dt
    eps = gps * l * l
    return {"devices": n_devices, "mode": mode, "dp": dp,
            "sp": model_parallel, "use_pallas": use_pallas,
            "global_batch": b,
            "ms_per_step": round(dt * 1e3, 2),
            "graphs_per_sec": round(gps, 1),
            "edges_per_sec": round(eps, 1),
            "collective_bytes_per_step": coll}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--mode", default="dp", choices=["dp", "dpsp"])
    ap.add_argument("--sp", type=int, default=2)
    ap.add_argument("--batch-per-dev", type=int, default=4)
    ap.add_argument("--l", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--edge-width", type=int, default=16)
    ap.add_argument("--height", type=int, default=2)
    ap.add_argument("--use-pallas", action="store_true",
                    help="fused attention kernel ON (composes with dpsp via "
                    "rectangular row-shard grids; interpret-mode on CPU)")
    ap.add_argument("--tpu", action="store_true",
                    help="use the real TPU slice (default: virtual CPU mesh; "
                    "NOTE: merely initializing the TPU backend before "
                    "switching to CPU changes the compiled-HLO text and "
                    "breaks collective accounting, so auto-detection is "
                    "deliberately avoided)")
    args = ap.parse_args()

    dev_counts = [int(x) for x in args.devices.split(",")]
    import jax
    if not args.tpu:
        nvirt = max(dev_counts)
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={nvirt}").strip()
        jax.config.update("jax_platforms", "cpu")
        log(f"virtual CPU mesh with {nvirt} devices (correctness-mode "
            "timings; pass --tpu on a real slice for real scaling)")

    results = []
    for n in dev_counts:
        if args.mode == "dpsp" and n % args.sp:
            log(f"skip n={n}: not divisible by sp={args.sp}")
            continue
        r = bench(n, args.mode, args.sp, args.batch_per_dev, args.l,
                  args.iters, args.width, args.edge_width, args.height,
                  use_pallas=args.use_pallas)
        results.append(r)
        log(f"n={n}: {r['ms_per_step']} ms/step, "
            f"{r['graphs_per_sec']} graphs/s, "
            f"coll={r['collective_bytes_per_step']}")

    if results:
        base = results[0]
        for r in results:
            scale = (r["edges_per_sec"] / base["edges_per_sec"]) \
                / (r["devices"] / base["devices"])
            r["scaling_efficiency_vs_first"] = round(scale, 3)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
