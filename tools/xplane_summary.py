"""Summarize a jax.profiler xplane trace: device-time by op name/category.

    python tools/xplane_summary.py [--dir /tmp/egtprof_step] [--top 30]

Parses the raw .xplane.pb with tensorflow's bundled proto (the
tensorboard_plugin_profile pipeline is broken in this environment: its
generated protos predate the installed protobuf runtime).
"""

import argparse
import collections
import glob
import re
import sys

PB2 = "tensorflow.tsl.profiler.protobuf.xplane_pb2"


def load_xspace(path):
    import importlib
    xplane_pb2 = importlib.import_module(PB2)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def categorize(name: str) -> str:
    n = name.lower()
    if "fused_layer" in n or "_fwd_kernel" in n or "_bwd_kernel" in n:
        return "pallas-fused-layer"
    if "egt_attention" in n or "flash" in n:
        return "pallas-attention"
    if "edge_block" in n:
        return "pallas-edge-block"
    if n.startswith(("fusion", "loop_fusion", "input_fusion", "output_fusion")):
        return "xla-fusion"
    if n.startswith(("copy", "slice", "bitcast", "transpose", "reshape",
                     "concatenate", "dynamic")):
        return "copy/relayout"
    if n.startswith(("dot", "convolution")):
        return "matmul"
    if "all-reduce" in n or "all-gather" in n or "collective" in n:
        return "collective"
    if "infeed" in n or "outfeed" in n or "send" in n or "recv" in n:
        return "host-io"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/egtprof_step")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--steps", type=int, default=None,
                    help="divide totals by this step count")
    args = ap.parse_args()

    paths = sorted(glob.glob(f"{args.dir}/plugins/profile/*/*.xplane.pb"))
    if not paths:
        print("no xplane under", args.dir, file=sys.stderr)
        return 1
    xs = load_xspace(paths[-1])

    by_name = collections.Counter()
    by_cat = collections.Counter()
    total_ps = 0
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        if "Host" in plane.name:
            continue
        emeta = plane.event_metadata
        for line in plane.lines:
            # the synchronous per-op timeline only — "Async XLA Ops" events
            # span their whole await window and would double-count
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = emeta.get(ev.metadata_id)
                name = md.name if md else str(ev.metadata_id)
                dur = ev.duration_ps
                # strip the %multiply.123 suffix digits for grouping
                gname = re.sub(r"[.\d]+$", "", name)
                by_name[gname] += dur
                by_cat[categorize(gname)] += dur
                total_ps += dur
    if not total_ps:
        print("no device op events found; planes:",
              [p.name for p in xs.planes], file=sys.stderr)
        return 1

    div = args.steps or 1
    scale = 1e-6 / div  # ps -> us
    print(f"total device op time: {total_ps * 1e-6 / div:.1f} us"
          + (" /step" if args.steps else " (all steps)"))
    print("\nby category:")
    for cat, ps in by_cat.most_common():
        print(f"  {ps * scale:10.1f} us  {100 * ps / total_ps:5.1f}%  {cat}")
    print(f"\ntop {args.top} ops:")
    for name, ps in by_name.most_common(args.top):
        print(f"  {ps * scale:10.1f} us  {100 * ps / total_ps:5.1f}%  {name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
