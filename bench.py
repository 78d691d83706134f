"""Throughput benchmark: EGT training step on one chip, at the flagship ZINC
shape plus PATTERN l=192 and TSP l=512 — with "auto" dispatch these exercise
all three attention paths the engine ships (round-3 matrix: vpu+bf16-chain at
zinc/pattern, the Pallas kernel at tsp), with MEASURED (traced) utilization
next to the analytic model.

Prints ONE JSON line. Headline metric stays zinc500k graphs/s (best-of-5,
comparable to BENCH_r01/r02) with the median alongside; each shape carries:
  - graphs_per_sec (best) / graphs_per_sec_median over 5 timing reps
  - mfu_analytic: analytic train FLOPs vs the v5e bf16 peak (197 TFLOP/s —
    the r1/r2 benches used 394e12, which is the chip's INT8 peak; the xplane
    device plane records peak_teraflops_per_second = 202.7 for this part, so
    r2's reported mfu=0.039 was really ~0.078)
  - measured_*: from a jax.profiler device trace of the same step — XLA's
    per-op cost analysis (flops, HBM bytes incl. memory-space breakdown)
    weighted by executed occurrences, against the plane's recorded peaks;
    plus the share of step time in relayout ("data formatting") ops.

vs_baseline divides zinc graphs/s by a roofline-derived estimate of the TF2
reference on one V100 (the reference publishes no throughput numbers —
BASELINE.md); derivation in egt_tpu/utils/roofline.py.
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from egt_tpu.utils.roofline import (BASELINE_ATTAINMENT_BAND, ShapeModel,
                                    v100_tf2_baseline_graphs_per_sec)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# (batch, pad_len, width, edge_width, heads, height) — must match the shipped
# 500k recipes; see tools/layerbench.py SHAPES.
# every shipped shape family: zinc/pattern/tsp exercise the three attention
# dispatch paths; zinc100k, cluster (dynamic-l twin of pattern), mnist and
# cifar10 pin a committed number + anchor on each family rather than
# extrapolating
BENCH_SHAPES = ("zinc500k", "zinc100k", "pattern500k", "cluster500k",
                "mnist500k", "cifar500k", "tsp500k")
HEADLINE = "zinc500k"
TRACE_ROOT = "/tmp/egtbench_trace"


def measure_shape(name, shape, reps=5, iters=30, trace_steps=20):
    import jax

    from tools.layerbench import build
    from tools.xplane_summary import aggregate

    b = shape[0]
    # 'auto' resolves the engine defaults per traced shape: the Pallas
    # attention kernel at l >= its measured crossover, einsum/vpu below
    step, params, opt, batch = build(shape, "bfloat16", "auto")
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    params, opt, loss = jax.block_until_ready(step(params, opt, batch, key))
    log(f"[{name}] compile+first step: {time.time() - t0:.1f}s "
        f"loss={float(loss):.4f}")
    for _ in range(3):
        params, opt, loss = step(params, opt, batch, key)
    jax.block_until_ready(loss)

    # the chip can be time-shared: report best AND median over 5 rounds.
    # every iteration chains donated state (the axon tunnel memoizes
    # identical dispatches — DESIGN_NOTES "measurement gotcha")
    rates = []
    for rep in range(reps):
        t0 = time.time()
        for _ in range(iters):
            params, opt, loss = step(params, opt, batch, key)
        jax.block_until_ready(loss)
        dt = time.time() - t0
        rates.append(b * iters / dt)
        log(f"[{name}] rep {rep}: {iters} steps in {dt:.3f}s -> "
            f"{rates[-1]:.1f} graphs/s")

    out = {
        "graphs_per_sec": round(max(rates), 1),
        "graphs_per_sec_median": round(statistics.median(rates), 1),
    }

    trace_dir = os.path.join(TRACE_ROOT, name)
    try:
        os.makedirs(trace_dir, exist_ok=True)
        with jax.profiler.trace(trace_dir):
            for _ in range(trace_steps):
                params, opt, loss = step(params, opt, batch, key)
            jax.block_until_ready(loss)
        agg = aggregate(trace_dir, trace_steps)
        cats = agg["categories"]
        fmt_pct = cats.get("data formatting", {}).get("pct", 0.0)
        pallas_pct = sum(row["pct"] for c, row in cats.items()
                         if c.startswith("pallas"))
        # full per-category share of traced device time (top 8), so the
        # artifact itself answers "where does each step go" (VERDICT r4)
        top_cats = dict(sorted(((c, round(row["pct"], 1))
                                for c, row in cats.items()),
                               key=lambda kv: -kv[1])[:8])
        out.update({
            "category_pct": top_cats,
            "step_time_ms_traced": round(agg["step_time_ms"], 3)
            if agg["step_time_ms"] is not None else None,
            "measured_mfu": round(agg["measured_mfu"], 4),
            "measured_hbm_gbps": round(agg["measured_hbm_gbps"], 1)
            if agg["measured_hbm_gbps"] is not None else None,
            "measured_hbm_util": round(agg["measured_hbm_util"], 4)
            if agg["measured_hbm_util"] is not None else None,
            "relayout_pct": round(fmt_pct, 1),
            "pallas_pct": round(pallas_pct, 1),
            "ops_per_step": agg["ops_per_step"],
        })
    except Exception as e:  # tracing is best-effort; timing stands alone
        log(f"[{name}] trace failed: {type(e).__name__}: {e}")
        out["trace_error"] = f"{type(e).__name__}: {e}"
    return out


def main():
    import jax

    from tools.layerbench import SHAPES

    from egt_tpu.ops.crossover import auto_dispatch, fused_layer_wins

    log(f"devices: {jax.devices()}")
    results = {}
    for name in BENCH_SHAPES:
        shape = SHAPES[name]
        b, l, w, ew, h, height = shape
        res = measure_shape(name, shape)
        m = ShapeModel(b=b, l=l, w=w, ew=ew, h=h, height=height)
        res["mfu_analytic"] = round(m.mfu(res["graphs_per_sec"]), 4)
        res["hbm_bw_util_lb"] = round(
            m.hbm_bw_util_lower_bound(res["graphs_per_sec"]), 4)
        # anchor EVERY shape, not just the headline: the measured-rule
        # dispatch path, the chip's per-step floor, and the V100/TF2
        # roofline-derived baseline this shape would run at
        # the whole-layer kernel is consulted first (all bench configs are
        # inside its eligibility envelope); the attention cascade otherwise
        res["dispatch_path"] = ("layer"
                                if fused_layer_wins(l, ew, "bfloat16")
                                else auto_dispatch(l, ew, w // h, h,
                                                   "bfloat16"))
        res["roofline_floor_ms"] = round(m.roofline_floor_ms_per_step(), 3)
        shape_baseline = v100_tf2_baseline_graphs_per_sec(m)
        res["baseline_graphs_per_sec"] = round(shape_baseline, 1)
        res["vs_baseline"] = round(res["graphs_per_sec"] / shape_baseline, 3)
        # the anchor assumes 30% roofline attainment for the TF2 reference;
        # publish the ratio across the plausible 20-35% band (high attainment
        # -> stronger baseline -> LOWER ratio) so the anchor's uncertainty is
        # in the artifact
        lo_att, hi_att = BASELINE_ATTAINMENT_BAND
        res["baseline_attainment_band"] = [lo_att, hi_att]
        res["vs_baseline_range"] = [
            round(res["graphs_per_sec"]
                  / v100_tf2_baseline_graphs_per_sec(m, hi_att), 3),
            round(res["graphs_per_sec"]
                  / v100_tf2_baseline_graphs_per_sec(m, lo_att), 3)]
        if ew <= 8:
            # MFU is low BY DESIGN here: at edge width 8 the step is
            # dominated by l^2-sized per-pair work on narrow tiles, not MXU
            # matmuls. NOTE the measured counters under-report when the
            # whole-layer Pallas kernel is dispatched (its flops/bytes are
            # invisible to XLA's per-op cost stats) — neither HBM util nor
            # MFU is a binding-roofline statement at this shape; the honest
            # account is DESIGN_NOTES "pattern500k traffic account" (r5)
            res["mfu_note"] = ("ew=8: per-pair-dominated; measured counters "
                               "exclude pallas-kernel internals — see "
                               "DESIGN_NOTES r5 pattern account")
        results[name] = res

    z = results[HEADLINE]
    zshape = SHAPES[HEADLINE]
    m = ShapeModel(b=zshape[0], l=zshape[1], w=zshape[2], ew=zshape[3],
                   h=zshape[4], height=zshape[5])
    baseline = v100_tf2_baseline_graphs_per_sec(m)
    print(json.dumps({
        "metric": "zinc500k_train_graphs_per_sec_per_chip",
        "value": z["graphs_per_sec"],
        "unit": "graphs/s",
        "vs_baseline": round(z["graphs_per_sec"] / baseline, 3),
        "baseline_graphs_per_sec": round(baseline, 1),
        "median": z["graphs_per_sec_median"],
        "mfu": z["mfu_analytic"],
        "train_gflop_per_graph": round(m.train_flops_per_graph() / 1e9, 3),
        "shapes": results,
    }))


if __name__ == "__main__":
    main()
