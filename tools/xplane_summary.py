"""Summarize a jax.profiler xplane trace: device-time, FLOPs and HBM traffic
by op category — MEASURED from the compiled program's executed events.

    python tools/xplane_summary.py [--dir /tmp/egtprof_step] [--top 30]
       [--steps N]

Parses the raw .xplane.pb with tensorflow's bundled proto (the
tensorboard_plugin_profile pipeline is broken in this environment: its
generated protos predate the installed protobuf runtime).

Each device op's event METADATA carries the profiler's per-execution cost
stats: `hlo_category` (XLA's own bucketing), `flops`/`model_flops`,
`bytes_accessed` and a `memory_access_breakdown` proto whose entries are
(operation_type, memory_space, bytes) with memory_space 1 = HBM — so
aggregating (metadata x event occurrences) yields measured per-step HBM
traffic and achieved FLOP/s against the plane's recorded peaks
(`peak_teraflops_per_second`, `peak_hbm_bw_gigabytes_per_second`).
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


def _stat_value(st):
    for f in ("double_value", "int64_value", "uint64_value", "str_value",
              "bytes_value", "ref_value"):
        v = getattr(st, f)
        if v:
            return v
    return 0


def _parse_varints(buf):
    """All (field_number, value) varint/len-delimited pairs of a proto buffer."""
    out, i = [], 0
    while i < len(buf):
        tag = buf[i]
        i += 1
        field, wire = tag >> 3, tag & 7
        if wire == 0:  # varint
            val, shift = 0, 0
            while True:
                b = buf[i]
                i += 1
                val |= (b & 0x7F) << shift
                shift += 7
                if not (b & 0x80):
                    break
            out.append((field, val))
        elif wire == 2:  # length-delimited
            ln, shift = 0, 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not (b & 0x80):
                    break
            out.append((field, buf[i:i + ln]))
            i += ln
        else:  # 64/32-bit — skip
            i += 8 if wire == 1 else 4
    return out


def parse_memory_breakdown(raw: bytes):
    """(hbm_bytes, other_bytes) from an OpMetrics.memory_accessed_breakdown
    buffer: repeated submessages {operation_type=1, memory_space=2, bytes=3};
    memory_space 1 is HBM in the profiler's numbering."""
    hbm = other = 0
    for field, sub in _parse_varints(raw):
        if field != 1 or not isinstance(sub, bytes):
            continue
        space = nbytes = 0
        for f2, v2 in _parse_varints(sub):
            if f2 == 2:
                space = v2
            elif f2 == 3:
                nbytes = v2
        if space == 1:
            hbm += nbytes
        else:
            other += nbytes
    return hbm, other


def device_plane(xs):
    for plane in xs.planes:
        if plane.name.startswith("/device:TPU") and plane.lines:
            return plane
    for plane in xs.planes:
        if "device" in plane.name.lower() and "CUSTOM" not in plane.name \
                and plane.lines:
            return plane
    return None


def plane_peaks(plane):
    peaks = {}
    smeta = plane.stat_metadata
    for st in plane.stats:
        md = smeta.get(st.metadata_id)
        if md:
            peaks[md.name] = _stat_value(st)
    return peaks


def op_metadata(plane):
    """metadata_id -> dict(name, short, category, flops, bytes, hbm_bytes)."""
    smeta = plane.stat_metadata
    out = {}
    for mid, md in plane.event_metadata.items():
        stats = {}
        for st in md.stats:
            sm = smeta.get(st.metadata_id)
            stats[sm.name if sm else str(st.metadata_id)] = _stat_value(st)
        flops = int(stats.get("model_flops") or stats.get("flops") or 0)
        raw_bd = stats.get("memory_access_breakdown") or b""
        hbm = None
        if isinstance(raw_bd, bytes) and raw_bd:
            hbm, _ = parse_memory_breakdown(raw_bd)
        short = md.name.split(" = ")[0].lstrip("%")
        short = re.sub(r"[.\d]+$", "", short)
        out[mid] = {
            "name": md.name,
            "short": short,
            "category": stats.get("hlo_category") or _fallback_cat(short),
            "flops": flops,
            "bytes": int(stats.get("bytes_accessed") or 0),
            "hbm_bytes": hbm,
        }
    return out


def _fallback_cat(short: str) -> str:
    n = short.lower()
    if n.startswith(("copy", "slice", "bitcast", "transpose", "reshape",
                     "concatenate", "dynamic")):
        return "copy/relayout"
    if n.startswith("fusion"):
        return "xla-fusion"
    if n.startswith(("dot", "convolution")):
        return "matmul"
    return "other"


def pallas_kind(name: str):
    n = name.lower()
    if "fused_layer" in n:
        return "pallas-fused-layer"
    if "egt_attention" in n or "flash" in n:
        return "pallas-attention"
    if "edge_block" in n:
        return "pallas-edge-block"
    return None


def aggregate(trace_dir: str, steps: int | None = None):
    """Measured per-step aggregates of the newest trace under `trace_dir`.

    Returns a dict: step_time_ms (device), op_time_ms (sum of sync op events),
    per-category {time_us, pct}, measured tflops_per_sec / mfu, measured
    hbm_gbps / hbm_util (profiler cost analysis x executed occurrences — real
    layouts, real fusion decisions), op_count per step, peaks.
    """
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))
    if not paths:
        raise FileNotFoundError(f"no xplane under {trace_dir}")
    xs = load_xspace(paths[-1])
    plane = device_plane(xs)
    if plane is None:
        raise ValueError("no TPU device plane in trace")
    peaks = plane_peaks(plane)
    meta = op_metadata(plane)

    n_steps = steps
    step_ps = []
    for line in plane.lines:
        if line.name == "Steps":
            step_ps = [ev.duration_ps for ev in line.events]
            if n_steps is None:
                n_steps = len(step_ps)
    n_steps = n_steps or 1

    time_by_cat = collections.Counter()
    time_by_name = collections.Counter()
    total_ps = 0
    total_flops = 0
    total_bytes = 0
    total_hbm = 0
    unknown_bytes = 0  # ops without a memory-space breakdown (custom-calls)
    n_events = 0
    for line in plane.lines:
        # the synchronous per-op timeline only — "Async XLA Ops" events span
        # their whole await window and would double-count
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            md = meta.get(ev.metadata_id)
            if md is None:
                continue
            dur = ev.duration_ps
            cat = pallas_kind(md["name"]) or md["category"]
            time_by_cat[cat] += dur
            time_by_name[md["short"]] += dur
            total_ps += dur
            total_flops += md["flops"]
            total_bytes += md["bytes"]
            if md["hbm_bytes"] is None:
                unknown_bytes += md["bytes"]
            else:
                total_hbm += md["hbm_bytes"]
            n_events += 1

    wall_s = (sum(step_ps) * 1e-12) if step_ps else total_ps * 1e-12
    peak_tflops = float(peaks.get("peak_teraflops_per_second") or 0)
    peak_hbm_gbps = float(peaks.get("peak_hbm_bw_gigabytes_per_second") or 0)
    tflops_per_sec = total_flops / wall_s / 1e12 if wall_s else 0.0
    hbm_gbps = total_hbm / wall_s / 1e9 if wall_s else 0.0
    hbm_coverage = (total_hbm / (total_hbm + unknown_bytes)
                    if total_hbm + unknown_bytes else 1.0)
    return {
        "n_steps": n_steps,
        "step_time_ms": (sum(step_ps) / len(step_ps) * 1e-9) if step_ps
        else None,
        "op_time_ms_per_step": total_ps * 1e-9 / n_steps,
        "ops_per_step": n_events // n_steps,
        "categories": {
            cat: {"us_per_step": ps * 1e-6 / n_steps,
                  "pct": 100.0 * ps / total_ps if total_ps else 0.0}
            for cat, ps in time_by_cat.most_common()
        },
        "by_name": time_by_name,
        "measured_tflops_per_sec": tflops_per_sec,
        "measured_mfu": tflops_per_sec / peak_tflops if peak_tflops else None,
        "measured_hbm_gbps": hbm_gbps,
        "measured_hbm_util": (hbm_gbps / peak_hbm_gbps
                              if peak_hbm_gbps else None),
        "hbm_coverage": hbm_coverage,
        "hbm_bytes_per_step": total_hbm // n_steps,
        "flops_per_step": total_flops // n_steps,
        "peak_tflops_per_sec": peak_tflops,
        "peak_hbm_gbps": peak_hbm_gbps,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/egtprof_step")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--steps", type=int, default=None,
                    help="divide totals by this step count")
    args = ap.parse_args()

    try:
        agg = aggregate(args.dir, args.steps)
    except (FileNotFoundError, ValueError) as e:
        print(e, file=sys.stderr)
        return 1

    st = agg["step_time_ms"]
    print(f"device step time: {st:.3f} ms" if st is not None else
          "device step time: n/a (no Steps line)")
    print(f"op time: {agg['op_time_ms_per_step']:.3f} ms/step over "
          f"{agg['ops_per_step']} ops/step")
    print(f"measured: {agg['measured_tflops_per_sec']:.2f} TFLOP/s "
          f"(MFU {agg['measured_mfu']:.3f} of "
          f"{agg['peak_tflops_per_sec']:.0f} peak)")
    if agg["measured_hbm_gbps"] is not None:
        print(f"measured HBM: {agg['measured_hbm_gbps']:.1f} GB/s "
              f"({100 * agg['measured_hbm_util']:.1f}% of "
              f"{agg['peak_hbm_gbps']:.0f} GB/s peak)")
    print("\nby category:")
    for cat, row in agg["categories"].items():
        print(f"  {row['us_per_step']:10.1f} us  {row['pct']:5.1f}%  {cat}")
    print(f"\ntop {args.top} op groups:")
    total_ps = sum(agg["by_name"].values())
    div = agg["n_steps"]
    for name, ps in agg["by_name"].most_common(args.top):
        print(f"  {ps * 1e-6 / div:10.1f} us  {100 * ps / total_ps:5.1f}%  "
              f"{name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
