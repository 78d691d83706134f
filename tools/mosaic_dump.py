"""Dump + structurally diff the Mosaic MLIR of the fused-layer forward and
backward Pallas ops (the round-2 bisection's recorded "next angle": the bwd op
carries ~12 us/program of overhead even with an IO-only body — DESIGN_NOTES
"Round-2 bwd-kernel investigation record").

Lowering is client-side (no remote compile), so this runs while the chip is
busy. The Mosaic module of each pallas_call ships inside the StableHLO
`tpu_custom_call` backend config; we extract both modules and report the
structural features that drive Mosaic's pipelining: operand/result window
counts, per-buffer block shapes, and the per-iteration DMA population.

    python tools/mosaic_dump.py --l 48 --ew 8 [--full]
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_calls(l, ew, h, dh, b):
    import jax
    import jax.numpy as jnp

    from egt_tpu.ops import fused_layer_pallas as flp
    from tests.test_fused_layer import make_cfg, make_inputs, make_params

    cfg = make_cfg(edge_width=ew, num_heads=h, model_width=dh * h)
    p = make_params(jax.random.PRNGKey(0), cfg)
    e, qkv, mask = make_inputs(jax.random.PRNGKey(1), cfg, b=b, l=l,
                               masked=False)
    spec = flp.make_spec(cfg, l, training=True)

    def fwd(p, e, qkv):
        eo, vo = flp.fused_layer_apply(p, cfg, e, qkv, mask, None,
                                       training=False, rng=None)
        return (eo ** 2).sum() + (vo ** 2).sum()

    def bwd(p, e, qkv):
        return jax.grad(fwd, argnums=(0, 1, 2))(p, e, qkv)

    return (fwd, (p, e, qkv)), (bwd, (p, e, qkv)), spec


def capture_mosaic(fn, args):
    """Lower `fn` with every pallas_call forced to debug=True and split the
    printed "The Mosaic module for pallas_call ..." sections (the backend
    config itself only carries MLIR *bytecode*, so textual capture at
    lowering time is the practical extraction point)."""
    import contextlib
    import io

    import jax
    from jax._src.pallas import pallas_call as pc_mod

    orig = pc_mod.pallas_call
    def patched(*a, **k):
        k["debug"] = True
        return orig(*a, **k)

    buf = io.StringIO()
    pc_mod.pallas_call = patched
    try:
        # pl.pallas_call in user modules may be bound already; patch both
        import jax.experimental.pallas as plx
        orig_plx = plx.pallas_call
        plx.pallas_call = patched
        from egt_tpu.ops import fused_layer_pallas as flp
        orig_flp = flp.pl.pallas_call
        flp.pl.pallas_call = patched
        try:
            with contextlib.redirect_stdout(buf):
                jax.jit(fn).lower(*args)
        finally:
            plx.pallas_call = orig_plx
            flp.pl.pallas_call = orig_flp
    finally:
        pc_mod.pallas_call = orig
    txt = buf.getvalue()
    mods = []
    for m in re.finditer(r"The Mosaic module for pallas_call ([^\n]*)\n", txt):
        start = m.end()
        i = txt.find("module", start)
        nxt = txt.find("The kernel jaxpr", start)
        end = nxt if nxt != -1 else len(txt)
        if i != -1 and i < end:
            mods.append((m.group(1), txt[i:end]))
    return mods


def summarize(tag, mod):
    lines = mod.splitlines()
    counts = collections.Counter()
    for ln in lines:
        for op in ("tpu.enqueue_dma", "tpu.wait_dma", "tpu.sem_signal",
                   "tpu.sem_wait", "vector.load", "vector.store",
                   "tpu.matmul", "tpu.iteration_bound", "scf.for",
                   "func.func", "tpu.memref_slice", "arith.constant"):
            if op in ln:
                counts[op] += 1
    header = [ln for ln in lines[:40] if "func @main" in ln or "window" in ln
              or "iteration" in ln or "dimension_semantics" in ln]
    n_operands = None
    m = re.search(r"func @main\((.*?)\)\s*(->|\{)", mod, re.S)
    if m:
        n_operands = m.group(1).count("memref")
    print(f"== {tag}: {len(lines)} MLIR lines, main memref args: {n_operands}")
    for k, v in sorted(counts.items()):
        print(f"   {k:24s} {v}")
    for ln in header[:8]:
        print(f"   | {ln.strip()[:160]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--l", type=int, default=48)
    ap.add_argument("--ew", type=int, default=8)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dh", type=int, default=8)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--full", action="store_true",
                    help="write full fwd/bwd Mosaic MLIR to /tmp/mosaic_{fwd,bwd}.mlir")
    args = ap.parse_args()

    import jax

    (fwd, fa), (bwd, ba), spec = build_calls(args.l, args.ew, args.heads,
                                             args.dh, args.b)
    print(f"spec: {spec}", file=sys.stderr)
    for tag, fn, a in (("fwd", fwd, fa), ("bwd", bwd, ba)):
        mods = capture_mosaic(fn, a)
        if not mods:
            print(f"== {tag}: NO mosaic module captured")
            continue
        for i, (src, mod) in enumerate(mods):
            summarize(f"{tag}[{i}] ({src})", mod)
            if args.full:
                path = f"/tmp/mosaic_{tag}_{i}.mlir"
                with open(path, "w") as fp:
                    fp.write(mod)
                print(f"   full MLIR -> {path}")


if __name__ == "__main__":
    main()
