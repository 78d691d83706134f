"""A/B the fused whole-layer Pallas kernel vs the XLA einsum path on real TPU.

Times a full jitted train step (fwd+bwd+adam) of the flagship ZINC-500k shape
(b=128, l=40, w=64, ew=64, h=8, 10 layers) and cross-checks numerics on-device.

Usage: python tools/fused_layer_bench.py [--dtype bfloat16] [--b 128] [--l 40]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--l", type=int, default=40)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--random-mask", type=float, default=0.1)
    ap.add_argument("--check", action="store_true",
                    help="numerics cross-check (f32, deterministic) first")
    ap.add_argument("--fwd-only", action="store_true",
                    help="time forward pass only (no grad/optimizer)")
    ap.add_argument("--p-cap", type=int, default=None,
                    help="override the kernel pack factor cap")
    ap.add_argument("--legs", default="einsum,fused")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from egt_tpu.models.graph_model import EGTGraphModel, GraphModelConfig
    from egt_tpu.parallel.dryrun import synthetic_batch

    log(f"backend: {jax.default_backend()}  devices: {jax.devices()}")

    def make(fused_layer, dtype, rmp):
        cfg = GraphModelConfig(
            model_width=64, edge_width=64, num_heads=8, model_height=10,
            node_input_kind="tokens", edge_input_kind="tokens",
            num_node_features=28, num_edge_features=4, num_targets=1,
            readout_kind="graph", upto_hop=16, random_mask_prob=rmp,
            use_svd=True, num_svd_features=16, sel_svd_features=8,
            transform_svd=True, random_neg=True, compute_dtype=dtype,
            fused_layer=fused_layer,
        )
        return EGTGraphModel(cfg)

    rng_np = np.random.default_rng(0)
    batch = synthetic_batch(rng_np, args.b, args.l)
    batch["singular_vectors"] = rng_np.normal(
        size=(args.b, args.l, 16, 2)).astype(np.float32)
    batch = jax.device_put(batch)

    if args.check:
        # pin the einsum path to HIGHEST so both sides use true-f32 matmuls
        # (TPU default for f32 is bf16-pass matmuls — that noise would
        # otherwise dominate the comparison)
        jax.config.update("jax_default_matmul_precision", "highest")
        m_ref = make(False, "float32", 0.0)
        m_fus = make(True, "float32", 0.0)
        params = m_ref.init(jax.random.PRNGKey(0))

        def loss_fn(model):
            def f(p):
                out, _ = model.apply(p, batch)
                return (out.astype(jnp.float32) ** 2).mean()
            return f

        lr = jax.jit(jax.value_and_grad(loss_fn(m_ref)))
        lf = jax.jit(jax.value_and_grad(loss_fn(m_fus)))
        vr, gr = lr(params)
        vf, gf = lf(params)
        log(f"loss ref={float(vr):.6f} fused={float(vf):.6f}")
        flat_r = jax.tree_util.tree_leaves_with_path(gr)
        flat_f = jax.tree_util.tree_leaves(gf)
        worst, worst_path = 0.0, None
        for (path, a), b in zip(flat_r, flat_f):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            denom = np.abs(a).max() + 1e-6
            rel = np.abs(a - b).max() / denom
            if rel > worst:
                worst, worst_path = rel, jax.tree_util.keystr(path)
        log(f"grad check: worst rel err {worst:.3e} at {worst_path}")
        assert abs(float(vr) - float(vf)) < 1e-4 * (abs(float(vr)) + 1e-3)
        assert worst < 5e-3, f"grad mismatch {worst} at {worst_path}"
        log("numerics check PASSED")
        jax.config.update("jax_default_matmul_precision", None)

    if args.p_cap is not None:
        from egt_tpu.ops import fused_layer_pallas as flp
        flp._P_CAP = args.p_cap

    results = {}
    legs = [(n, n == "fused") for n in args.legs.split(",")]
    for name, fused in legs:
        model = make(fused, args.dtype, args.random_mask)
        params = model.init(jax.random.PRNGKey(0))
        tx = optax.adam(1e-3)
        opt = tx.init(params)

        if args.fwd_only:
            def step(p, o, rng):
                out, _ = model.apply(p, batch, training=True, rng=rng)
                return p, o, (out.astype(jnp.float32) ** 2).mean()
        else:
            def step(p, o, rng):
                def f(pp):
                    out, _ = model.apply(pp, batch, training=True, rng=rng)
                    return (out.astype(jnp.float32) ** 2).mean()
                loss, g = jax.value_and_grad(f)(p)
                up, o2 = tx.update(g, o, p)
                return optax.apply_updates(p, up), o2, loss

        jstep = jax.jit(step, donate_argnums=(0, 1))
        t0 = time.perf_counter()
        params, opt, loss = jstep(params, opt, jax.random.PRNGKey(1))
        jax.block_until_ready(loss)
        log(f"{name}: compile+1st step {time.perf_counter() - t0:.1f}s "
            f"loss={float(loss):.4f}")
        for i in range(3):  # warmup
            params, opt, loss = jstep(params, opt, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for i in range(args.iters):
            params, opt, loss = jstep(params, opt, jax.random.PRNGKey(10 + i))
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / args.iters
        results[name] = dt
        log(f"{name}: {dt * 1e3:.2f} ms/step  "
            f"{args.b / dt:.0f} graphs/s")

    if "einsum" in results and "fused" in results:
        speedup = results["einsum"] / results["fused"]
        log(f"fused-layer speedup vs einsum: {speedup:.3f}x "
            f"({args.dtype}, b={args.b}, l={args.l}, rmp={args.random_mask}, "
            f"fwd_only={args.fwd_only}, p_cap={args.p_cap})")


if __name__ == "__main__":
    main()
