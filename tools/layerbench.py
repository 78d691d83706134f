"""Kernel-path benchmark at the shipped config shapes (real TPU).

Times the full training step (params+opt update, donated buffers — exactly the
engine's step) for each kernel-path combination at a given model shape, plus a
layer-stack-only fwd+bwd isolation. Used to measure the crossover matrix recorded
in DESIGN_NOTES and to drive fused-kernel development (VERDICT round 1, item 1).

    python tools/layerbench.py --shape zinc500k --paths xla,attn,edge,layer
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = {
    # name: (batch, pad_len, width, edge_width, heads, height)
    "zinc500k": (128, 40, 64, 64, 8, 10),
    "zinc100k": (128, 40, 48, 48, 8, 4),
    "pattern500k": (128, 192, 64, 8, 8, 16),
    # the PATTERN/CLUSTER schemes bucket pad lengths at [128, 192]; the l=128
    # bucket is a real executed shape, so the dispatch matrix measures it
    "pattern500k_l128": (128, 128, 64, 8, 8, 16),
    "cluster500k": (128, 192, 64, 8, 8, 16),
    "mnist500k": (128, 80, 96, 64, 8, 4),
    "cifar500k": (128, 160, 96, 64, 8, 4),
    "tsp500k": (8, 512, 64, 64, 8, 10),
}


def build(shape, dtype, path, training=True, scan_k: int = 0):
    import jax
    import jax.numpy as jnp
    import optax

    from egt_tpu.models.graph_model import EGTGraphModel, GraphModelConfig
    from egt_tpu.parallel.dryrun import synthetic_batch
    from egt_tpu.training import metrics as M
    from egt_tpu.training import optim

    b, l, w, ew, h, height = shape
    cfg = GraphModelConfig(
        model_width=w, edge_width=ew, num_heads=h, model_height=height,
        node_input_kind="tokens", edge_input_kind="tokens",
        num_node_features=28, num_edge_features=4, num_targets=1,
        readout_kind="graph", upto_hop=16, random_mask_prob=0.1,
        use_svd=True, num_svd_features=16, sel_svd_features=8,
        transform_svd=True, random_neg=True, compute_dtype=dtype,
    )
    base, _, mods = path.partition("+")
    mods = mods.split("+") if mods else []
    if base == "auto":
        # the engine defaults: every dispatch resolved per traced shape from
        # the measured crossover matrix (ops/crossover.py)
        cfg.fused_attention = "auto"
        cfg.attention_impl = "auto"
        cfg.fused_layer = "auto"
    else:
        cfg.fused_attention = base == "attn"
        # 'xla' pins the einsum chain; 'vpu' the elementwise chain (no dots)
        cfg.attention_impl = "vpu" if base == "vpu" else "einsum"
        cfg.fused_layer = base == "layer"
    cfg.fused_edge_block = base == "edge" or "edge" in mods
    # +remat: full per-layer recompute; +rdots: selective (dot outputs stay
    # resident, only the elementwise per-pair chain is recomputed)
    cfg.remat = "dots" if "rdots" in mods else ("remat" in mods)
    cfg.attn_chain_f32 = "c16" not in mods  # +c16: bf16 per-pair chain
    model = EGTGraphModel(cfg)
    params = model.init(jax.random.PRNGKey(0))

    optimizer = optim.make_optimizer("adam", 5e-4, params=params)
    opt_state = optimizer.init(params)

    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, b, l)
    batch["singular_vectors"] = rng.normal(size=(b, l, 16, 2)).astype(np.float32)
    batch = jax.device_put(batch)

    def loss_fn(p, bt, key):
        out, ctx = model.apply(p, bt, training=training, rng=key)
        s, c = M.mae_loss(out, bt["target"], None, bt["sample_mask"])
        return s / jnp.maximum(c, 1.0)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(p, o, bt, key):
        loss, grads = jax.value_and_grad(loss_fn)(p, bt, key)
        updates, o = optimizer.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return p, o, loss

    if scan_k:
        # the engine's steps_per_dispatch mode (trainer.py multi_step): K
        # steps per device dispatch via lax.scan — one RPC per K steps, so
        # host/tunnel dispatch latency stops shadowing the device step
        batches = jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * scan_k), batch)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step_k(p, o, bts, key):
            def body(carry, inp):
                p, o = carry
                bt, ki = inp
                loss, grads = jax.value_and_grad(loss_fn)(
                    p, bt, jax.random.fold_in(key, ki))
                updates, o = optimizer.update(grads, o, p)
                return (optax.apply_updates(p, updates), o), loss

            (p, o), losses = jax.lax.scan(
                body, (p, o), (bts, jnp.arange(scan_k, dtype=jnp.int32)))
            return p, o, losses[-1]

        return train_step_k, params, opt_state, batches

    return train_step, params, opt_state, batch


def timeit(step, params, opt_state, batch, iters=30, reps=3):
    import jax

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    params, opt_state, loss = jax.block_until_ready(
        step(params, opt_state, batch, key))
    compile_s = time.time() - t0
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, batch, key)
    jax.block_until_ready(loss)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        for _ in range(iters):
            params, opt_state, loss = step(params, opt_state, batch, key)
        jax.block_until_ready(loss)
        best = min(best, (time.time() - t0) / iters)
    return best, compile_s, float(loss)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="zinc500k")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--paths", default="xla,attn,edge,layer")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--scan-k", type=int, default=0,
                    help="time the engine's steps_per_dispatch mode: K train "
                    "steps per device dispatch (lax.scan)")
    ap.add_argument("--eval", action="store_true", help="time eval (no bwd/opt)")
    ap.add_argument("--matrix", metavar="OUT.json",
                    help="sweep every SHAPES x --paths x --dtype combination "
                    "(dtypes comma-separated) and write the crossover matrix "
                    "as JSON (drives the 'auto' kernel-selection thresholds "
                    "via egt_tpu/ops/crossover.py)")
    ap.add_argument("--merge", action="store_true",
                    help="with --matrix: keep existing rows, replacing only "
                    "the (shape, path, dtype) cells re-measured this run — "
                    "so a single path can be re-swept without re-timing the "
                    "whole matrix")
    ap.add_argument("--only-shapes", default=None,
                    help="with --matrix: comma-separated subset of SHAPES "
                    "to sweep")
    ap.add_argument("--thresholds", metavar="MATRIX.json", nargs="?",
                    const="CROSSOVER_MATRIX.json",
                    help="print the auto thresholds derived from an existing "
                    "matrix file and exit")
    args = ap.parse_args()

    if args.thresholds:
        import json
        from egt_tpu.ops.crossover import derive_thresholds, measured_points
        rows = json.load(open(args.thresholds))
        for dtype in sorted({r.get("dtype", "bfloat16") for r in rows}):
            pts = measured_points(rows, dtype)
            print(f"[{dtype}] measured (l, ew) -> kernel wins: "
                  f"{ {k: v for k, v in sorted(pts.items())} }")
            print(f"[{dtype}] thresholds (attn iff l >= t[ew]): "
                  f"{derive_thresholds(rows, dtype)}")
        return

    if args.matrix:
        import json
        rows = []
        sweep_shapes = (dict(SHAPES) if not args.only_shapes else
                        {n: SHAPES[n] for n in args.only_shapes.split(",")})
        for dtype in args.dtype.split(","):
            for sname, shape in sweep_shapes.items():
                b, l, w, ew, h, height = shape
                for path in args.paths.split(","):
                    try:
                        step, params, opt, batch = build(shape, dtype, path,
                                                         training=not args.eval)
                        dt, comp, loss = timeit(step, params, opt, batch,
                                                iters=args.iters)
                        row = {"shape": sname, "path": path, "dtype": dtype,
                               "l": l, "ew": ew, "b": b, "w": w, "h": h,
                               "ms_per_step": round(dt * 1e3, 3),
                               "graphs_per_sec": round(shape[0] / dt, 1),
                               "compile_s": round(comp, 1)}
                    except Exception as e:
                        row = {"shape": sname, "path": path, "dtype": dtype,
                               "l": l, "ew": ew, "b": b, "w": w, "h": h,
                               "error": f"{type(e).__name__}: {e}"}
                    rows.append(row)
                    print(row, file=sys.stderr, flush=True)
        if args.merge and os.path.exists(args.matrix):
            fresh = {(r["shape"], r["path"], r["dtype"]) for r in rows}
            kept = [r for r in json.load(open(args.matrix))
                    if (r["shape"], r["path"], r.get("dtype", "bfloat16"))
                    not in fresh]
            rows = kept + rows
        for dtype in {r.get("dtype", "bfloat16") for r in rows}:
            for sname in {r["shape"] for r in rows}:
                ok = [r for r in rows
                      if r["shape"] == sname
                      and r.get("dtype", "bfloat16") == dtype
                      and "error" not in r]
                for r in ok:
                    r.pop("best_for_shape", None)
                if ok:
                    best = min(ok, key=lambda r: r["ms_per_step"])
                    best["best_for_shape"] = True
        with open(args.matrix, "w") as fp:
            json.dump(rows, fp, indent=1)
        print(f"matrix written to {args.matrix}", file=sys.stderr)
        from egt_tpu.ops.crossover import derive_thresholds
        for dtype in args.dtype.split(","):
            print(f"derived auto thresholds [{dtype}]: "
                  f"{derive_thresholds(rows, dtype)}", file=sys.stderr)
        return

    shape = SHAPES[args.shape]
    b = shape[0]
    print(f"shape={args.shape} {shape} dtype={args.dtype}", file=sys.stderr)
    for path in args.paths.split(","):
        try:
            step, params, opt, batch = build(shape, args.dtype, path,
                                             training=not args.eval,
                                             scan_k=args.scan_k)
            k = max(1, args.scan_k)
            dt, comp, loss = timeit(step, params, opt, batch,
                                    iters=max(1, args.iters // k))
            dt /= k
            print(f"{path:10s} {dt * 1e3:8.3f} ms/step  {b / dt:9.1f} graphs/s"
                  f"  (compile {comp:.1f}s, loss {loss:.4f}"
                  f"{f', scan_k={k}' if args.scan_k else ''})", flush=True)
        except Exception as e:
            print(f"{path:10s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
