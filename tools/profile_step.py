"""Capture a device trace of the train step and print the HLO op-time breakdown.

    python tools/profile_step.py --shape zinc500k --path xla

Writes the xplane under --dir and, if tensorboard_plugin_profile is available,
prints the top ops by self-time so kernel work can target the real hot spots.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.layerbench import SHAPES, build  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="zinc500k")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--path", default="xla")
    ap.add_argument("--dir", default="/tmp/egtprof_step")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax

    step, params, opt, batch = build(SHAPES[args.shape], args.dtype, args.path)
    key = jax.random.PRNGKey(1)
    params, opt, loss = step(params, opt, batch, key)  # compile
    jax.block_until_ready(loss)

    os.makedirs(args.dir, exist_ok=True)
    with jax.profiler.trace(args.dir):
        for _ in range(args.steps):
            params, opt, loss = step(params, opt, batch, key)
        jax.block_until_ready(loss)
    print(f"trace written to {args.dir}", file=sys.stderr)

    xplanes = sorted(glob.glob(os.path.join(
        args.dir, "plugins/profile/*/*.xplane.pb")))
    if not xplanes:
        print("no xplane found", file=sys.stderr)
        return
    xplane = xplanes[-1]
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    except ImportError:
        print("tensorboard_plugin_profile not available; inspect "
              f"{xplane} manually", file=sys.stderr)
        return
    import json

    data, _ = rtd.xspace_to_tool_data([xplane], "framework_op_stats", {})
    rows = json.loads(data) if isinstance(data, (str, bytes)) else data
    # rows: list of dicts from the op stats table
    if isinstance(rows, dict):
        rows = rows.get("data", rows)
    print(f"{'self_us':>10} {'total%':>7}  op")
    try:
        table = rows[0]["p"] if isinstance(rows[0], dict) and "p" in rows[0] \
            else rows
    except Exception:
        table = rows
    for r in table[: args.top]:
        print(r)


if __name__ == "__main__":
    main()
